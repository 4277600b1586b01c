from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   state_sharding, embedding_table_shapes)
