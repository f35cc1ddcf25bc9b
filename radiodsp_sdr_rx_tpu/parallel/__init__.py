"""Parallel/distributed layer: mesh, channel sharding, time-axis halo exchange.

SURVEY.md §2.3 mapping: the reference's producer/consumer DMA queues become the
block pipeline; its overlap-save carry becomes the ppermute ring halo (SP/CP);
the single receiver becomes a sharded channel bank (DP); multi-host scale-out
uses jax.distributed + a global mesh (DCN)."""

from radiodsp_sdr_rx_tpu.parallel.mesh import (
    make_mesh,
    make_global_mesh,
    initialize_distributed,
)
from radiodsp_sdr_rx_tpu.parallel.stream_shard import (
    sharded_overlap_save,
    sharded_first_order_iir,
    sharded_agc_envelope,
    make_time_sharded_ssb_chain,
    make_bank_time_sharded_chain,
    shard_channel_bank,
)
from radiodsp_sdr_rx_tpu.parallel.stream_shard import sharded_panadapter  # noqa: E402
from radiodsp_sdr_rx_tpu.parallel.pallas_halo import (  # noqa: E402
    ring_shift_right_pallas,
    shift_from_left_pallas,
)
from radiodsp_sdr_rx_tpu.parallel.fused_shard import (  # noqa: E402
    ShardedFusedBank,
)
