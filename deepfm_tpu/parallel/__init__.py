from deepfm_tpu.parallel.embedding_shard import (
    make_a2a_lookup,
    make_a2a_lookup_packed,
    make_lookup_fn,
    make_packed_lookup_factory,
    make_psum_lookup,
    make_psum_lookup_packed,
    sparse_grad_exchange,
)
from deepfm_tpu.parallel.ring_attention import ring_field_attention
from deepfm_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    build_hybrid_mesh,
    build_mesh,
    initialize_distributed,
)
from deepfm_tpu.parallel.sharding import (
    batch_shardings,
    replicated,
    state_shardings,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "batch_shardings",
    "build_hybrid_mesh",
    "build_mesh",
    "initialize_distributed",
    "make_a2a_lookup",
    "make_a2a_lookup_packed",
    "make_lookup_fn",
    "make_packed_lookup_factory",
    "make_psum_lookup",
    "make_psum_lookup_packed",
    "replicated",
    "ring_field_attention",
    "sparse_grad_exchange",
    "state_shardings",
]
