"""dxa_pagerank_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference `coeit/dxa-pageRank`
(a DXRAM chunk-store BSP PageRank, /root/reference) as idiomatic
Spark DataFrame programs, extended per the north_rule with connected
components, label propagation, triangle counting, Common-Crawl-style
page ingestion (HTML -> text -> links -> edges), checkpoint/resume,
and large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design notes live in SURVEY.md; reference citations in docstrings are
file:line into /root/reference.
"""

__version__ = "0.1.0"
