"""graftlouvain — a from-scratch PySpark-native distributed link-graph analytics engine.

Capabilities (see SURVEY.md §2 for the full inventory mapped to the reference
``nmandrus1/louvain-rs`` at /root/reference):

- multi-level Louvain community detection (synchronous supersteps + coarsening)
- PageRank, connected components, label propagation, triangle counting
- edge extraction from a source-code corpus table ``(repo, path, commit, lang, content)``
- checkpoint/resume with per-partition lineage + metrics
- training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis,
  multimodal column plumbing

Everything is DataFrame-first: joins/aggregations instead of MPI message
exchanges, hash partitioning instead of block vertex ownership, and
Arrow-vectorized pandas UDFs only where built-in operators can't express the
semantics. No RDD usage except ``zipWithIndex`` for scalable dense-id
assignment.
"""

from graftlouvain.operators.graph import LinkGraph
from graftlouvain.operators.louvain import louvain, louvain_level, modularity
from graftlouvain.session import get_spark

__all__ = ["LinkGraph", "louvain", "louvain_level", "modularity", "get_spark"]

__version__ = "0.1.0"
