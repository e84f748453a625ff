"""Device-mesh and sharding helpers (pjit over data/chunk axes)."""

from .mesh import make_mesh, replicate, shard_batch  # noqa: F401
