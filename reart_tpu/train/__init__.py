"""Per-sequence test-time optimization engine.

The reference drives optimization with a Python loop that round-trips
device -> host -> multiprocessing pool for the Hungarian assignment every 5
iterations (run_robot.py:154-221). Here the WHOLE fit — both the recon phase
and the assignment phase, including the linear-assignment solves — compiles
into a handful of XLA programs (`lax.scan` chunks) that never leave the TPU.
"""

from reart_tpu.train.schedules import tau_cosine
from reart_tpu.train.engine import (
    FitConfig,
    FlowContext,
    AssignContext,
    make_optimizer,
    build_assign_context,
    fit,
    fit_base,
    fit_kinematic,
)
from reart_tpu.train.corr import (
    CorrTrainConfig,
    train_corr,
    match_precision,
)
