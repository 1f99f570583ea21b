"""Metadata schema + filtered search.

API parity with /root/reference/src/metadata/ (schema.rs, query_filtering.rs):
fields with up to 1024 discrete values, filters Is/And/Or over Eq/Ne
predicates.

TPU-native re-design: the reference encodes values as ±weight binary dims
and inserts per-combination *replica nodes* under a pseudo-root
(metadata/mod.rs:127-212) so filtered traversal stays inside the graph. On
TPU the natural formulation is a **mask**: per-field value-id arrays live in
HBM next to the vectors; a filter compiles to a boolean mask over node ids,
applied inside the fused top-k (and, for very selective filters, the search
falls back to a masked brute-force scan — exact and fast on the MXU).
Observable behavior (which vectors match) is identical; the mechanism is
hardware-appropriate.
"""

from cosdata_tpu.metadata.schema import MetadataSchema  # noqa: F401
from cosdata_tpu.metadata.filtering import compile_filter  # noqa: F401
