from .depth import dense_warp_consistency, project, sample_depth  # noqa: F401
from .epipolar import (  # noqa: F401
    E_to_F,
    F_to_E,
    T_to_E,
    T_to_F,
    decompose_essential_matrix,
    generalized_epi_dist,
    relative_pose_error,
    sym_epipolar_distance,
    sym_epipolar_distance_all,
)
from .gt_generation import (  # noqa: F401
    IGNORE_FEATURE,
    UNMATCHED_FEATURE,
    gt_matches_from_homography,
    gt_matches_from_pose_depth,
)
from .homography import (  # noqa: F401
    homography_corner_error,
    sample_homography_corners,
    solve_homography_dlt,
    sym_homography_error,
    sym_homography_error_all,
    warp_points,
    warp_points_np,
)
from .utils import (  # noqa: F401
    angle_error_mat,
    angle_error_vec,
    from_homogeneous,
    skew_symmetric,
    so3exp_map,
    to_homogeneous,
)
from .wrappers import Camera, Pose  # noqa: F401
