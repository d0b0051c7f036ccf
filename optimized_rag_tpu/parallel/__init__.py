"""Device-mesh parallelism.

The reference has no distributed execution at all (SURVEY.md §2.4) — its
"distribution" is HTTPS to OpenAI and TCP to Postgres. This layer is the
TPU-native first-class replacement: a `jax.sharding.Mesh`, the corpus
sharded across ICI on the data axis, per-shard fused top-k and an
all-gather merge playing the role NCCL collectives would in a GPU design.
"""

from optimized_rag_tpu.parallel.mesh import (
    make_mesh, corpus_sharding, replicated_sharding)
from optimized_rag_tpu.parallel.sharded_topk import (
    sharded_topk, ShardedDenseIndex)
