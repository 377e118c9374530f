"""Distribution layer: device-mesh scenario sweeps + collectives.

The scaling axis of this framework is `batch` (SURVEY.md §2.3): scenarios
shard across a `jax.sharding.Mesh` with shard_map, metric reductions ride
ICI via psum/pmean, and multi-host dispatch uses jax.distributed (DCN) —
the reference's YARP pub/sub has no analog here because all stages live in
one jitted graph.
"""
