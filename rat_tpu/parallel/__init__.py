from .mesh import (make_mesh, batch_sharding, parse_mesh_spec,
                   replicated_sharding, resolve_mesh, state_sharding,
                   embedding_table_shapes)
