"""Multi-chip scaling via `jax.sharding.Mesh` + sharding-annotated jit.

The reference is single-process single-GPU (SURVEY §2.7: its only
"parallelism" is a DataParallel wrap of a frozen feature extractor and a CPU
multiprocessing pool for Hungarian solves). The exploitable parallel axes of
this workload are:

  * `seq`  — independent sequences (benchmark sweeps / batch fitting): pure
    data parallelism, zero cross-talk except the optimizer step;
  * `frame` — the T-1 non-canonical frames inside one sequence: per-frame
    proposals/losses are independent; only the shared seg-MLP gradients need
    a cross-frame reduction, which XLA lowers to a `psum` over ICI when the
    frame axis is sharded.

We lay both on a 2-D `Mesh(("seq", "frame"))` and annotate shardings with
`NamedSharding`; XLA's SPMD partitioner inserts the collectives. No NCCL/MPI
translation — there is nothing to translate (SURVEY §2.7).
"""

from reart_tpu.parallel.mesh import (
    make_mesh,
    batch_spec,
    replicated_spec,
    make_batched_fit_step,
    init_batched_params,
    fit_batch,
    fit_base_candidates,
    fit_base_sequences,
)
