from .mesh import domain_mesh, shard_state, state_sharding

__all__ = ["domain_mesh", "shard_state", "state_sharding"]
