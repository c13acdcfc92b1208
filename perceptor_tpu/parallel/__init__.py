"""Device mesh, sharding rules, and collectives — the distributed backend.

The reference has NO framework-level parallelism (SURVEY §2.8): everything
runs single-process on one GPU, with memory pressure handled by fp16 /
attention slicing / checkpointing. On TPU, parallelism is a first-class
subsystem: a named-axis mesh over ICI/DCN, GSPMD sharding annotations, and
XLA-inserted collectives (the TPU-native equivalent of NCCL).

Axis conventions (SURVEY §7.3):
    data     batch / cutouts / the CFG pair  (pure data parallel; DCN-safe)
    tensor   channels / attention heads      (tensor parallel; ICI)
    context  flattened H*W image tokens      (sequence/context parallel; ICI)
"""

from perceptor_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_TENSOR,
    AXIS_CONTEXT,
    AXIS_STAGE,
    create_mesh,
    create_hybrid_mesh,
    global_batch_from_local,
    group_by_granule,
    initialize_distributed,
)
from perceptor_tpu.parallel.pipeline import pipeline, pipeline_body
from perceptor_tpu.parallel.plan import (
    ContextParallelPlan,
    RoutingReport,
    context_parallel,
    current_plan,
    explain,
    plan_for_mesh,
    record_routing,
    shard_spatial,
)
from perceptor_tpu.parallel.ring_attention import (
    ring_attention,
    ring_self_attention,
)
from perceptor_tpu.parallel.ulysses import (
    ulysses_attention,
    ulysses_self_attention,
)
from perceptor_tpu.parallel.partition import (
    PartitionRules,
    SD_TENSOR_PARALLEL_RULES,
    partition_params,
    shard_params,
    shard_batch,
    shard_for_sampling,
    replicate,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_TENSOR",
    "AXIS_CONTEXT",
    "create_mesh",
    "create_hybrid_mesh",
    "global_batch_from_local",
    "group_by_granule",
    "initialize_distributed",
    "PartitionRules",
    "SD_TENSOR_PARALLEL_RULES",
    "partition_params",
    "shard_params",
    "shard_batch",
    "shard_for_sampling",
    "replicate",
    "ring_attention",
    "ring_self_attention",
    "ulysses_attention",
    "ulysses_self_attention",
    "AXIS_STAGE",
    "pipeline",
    "pipeline_body",
    "ContextParallelPlan",
    "context_parallel",
    "current_plan",
    "explain",
    "plan_for_mesh",
    "record_routing",
    "RoutingReport",
    "shard_spatial",
]
