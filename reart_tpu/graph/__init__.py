"""Graph stage: edge costs, MST, part merging, kinematic-tree construction.

This layer runs on the HOST (it executes twice per fit, between optimization
phases — reference run_robot.py:232-243): batched tensor costs are jnp,
combinatorial structure (greedy MST, graph contraction, DAG conversion) is
numpy / networkx. Parity targets: utils/graph_utils.py and
utils/kinematic_utils.py of the reference.
"""

from reart_tpu.graph.costs import (
    frobenius_cost,
    compute_root_cost,
    compute_mean_screw_param,
    compute_relative_trans,
    compute_geo_cost,
    compute_screw_trans,
    compute_screw_cost,
    fps_sample_cano,
    fps_index_list,
    compute_spatial_cost,
    compute_joint_cost,
)
from reart_tpu.graph.mst import (
    mst,
    merge_graph,
    merging_wrapper,
    mst_wrapper,
    denoise_seg_label,
    filter_seg_label,
)
from reart_tpu.graph.kinematics import (
    extract_kinematic,
    to_dag,
    build_graph,
    edge_index2edges,
)
