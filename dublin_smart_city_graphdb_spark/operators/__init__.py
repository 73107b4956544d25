"""Extension operators for large-scale training-data pipelines (SURVEY §7 M8).

Dedup / similarity / text-analysis live as harness queries
(``harness/pipeline.py``) since they compose from builtins; this package
holds the operators that need Python plumbing (Arrow-batched Pandas UDFs):
multimodal column processing.
"""
