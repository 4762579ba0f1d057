"""mdm_ray — a Ray-Data-native entity-resolution / MDM engine.

Brand-new implementation (not a port) of the record-linkage semantics of the
``johanesalxd/mdm-gcp`` reference demo, re-architected for Ray Data streaming
execution over Arrow blocks: standardization, blocking (phonetic + MinHash-LSH
with salting), batched pair scoring (exact / fuzzy / vector / business-rule
ensemble), distributed transitive clustering (iterative min-label propagation),
survivorship and deterministic entity IDs — plus the training-data operators a
100 TB pipeline needs (dedup family, ANN similarity search, text analysis,
multimodal stubs).

Reference semantics citations use ``file:line`` into ``/root/reference/``.
"""

__version__ = "0.1.0"

# Apply the engine's Ray Data context tuning (block sizing + hash shuffle) at
# import time: Ray snapshots the DataContext into every Dataset at creation,
# so the tuning must precede any Dataset a caller builds (tests / drivers
# often create input Datasets before invoking pipeline functions). Process-
# local config only — does not initialize Ray.
from .dsutil import ensure_context as _ensure_context

try:
    _ensure_context()
except (ImportError, AttributeError):  # pragma: no cover — ray.data absent /
    pass                               # DataContext API changed
