"""Index model families: flat (exact), HNSW (graph ANN), SQ8 variants.

The reference ships one index family pair — B-tree + HNSW (reference
src/schema/table.rs:72 IndexType{BTree, Hnsw}); the SQL k-NN path is
brute force (SURVEY.md §2.3). Here both the exact path (`flat`) and the
graph path (`hnsw`) are first-class device engines.
"""

from turdb_tpu.models.flat import FlatIndex, flat_search  # noqa: F401
from turdb_tpu.models.hnsw import HnswIndex, HnswConfig  # noqa: F401
