from . import embedding, launch, mesh
from .embedding import (alltoall_lookup, gspmd_lookup, mod_shard_table,
                        sharded_lookup, unshard_table)
from .mesh import (batch_sharding, make_mesh, param_shardings, shard_batch,
                   shard_state, state_shardings, table_sharding)
