"""edge_deid_studio_ray — a Ray-Data-native de-identification / extraction engine.

A brand-new engine (NOT a port) reproducing the query & data-processing
semantics of the reference ``Justin21523/edge-deid-studio`` as
``ray.data.Dataset`` pipelines: read_parquet → map_batches over zero-copy
Arrow batches (actor pools for stateful stages) → groupby/aggregate →
write_parquet, streaming with backpressure.

Layout:
- ``kernels/``   pure per-document functions (the byte-identity oracle surface)
- ``stages/``    Ray Data batch transforms wrapping the kernels
- ``sources/``   deterministic synthetic sources (Common-Crawl-style pages)
- ``pipelines/`` end-to-end pipeline compositions + lineage/resume
- ``functions/`` corpus-level functions (dedup, similarity, text stats)
- ``state/``     partition manifests / checkpoint-resume protocol
"""

from .config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
