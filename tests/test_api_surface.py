"""Reference API-surface manifest.

Pins every public name of the reference package (uniflowmatch/models/__init__.py:16-25,
utils/flow_resizing.py, utils/geometry.py, utils/viz.py, models/utils.py) to
an equivalent in ufm_tpu, so a refactor cannot silently drop a name a
switching user would reach for. Torch-suffixed reference names map to the
framework-native equivalent (we are not a torch library); everything else is
name-for-name.
"""

import importlib

import pytest

# module -> names that must exist with the SAME name
MANIFEST = {
    "ufm_tpu.models": [
        # reference models/__init__.py __all__
        "UFMClassificationRefinementOutput",
        "UFMFlowFieldOutput",
        "UFMMaskFieldOutput",
        "UFMOutputInterface",
        "UniFlowMatchModelsBase",
        "UniFlowMatch",
        "UniFlowMatchClassificationRefinement",
        "UniFlowMatchConfidence",
    ],
    "ufm_tpu.utils.flow_resizing": [
        # reference utils/flow_resizing.py public classes/functions
        "ImagePairsManipulationBase",
        "ResizeHorizontalAxisManipulation",
        "ResizeVerticalAxisManipulation",
        "ResizeToFixedManipulation",
        "scale_axis",
        "CenterCropManipulation",
        "ImagePairsManipulationComposite",
        "AutomaticShapeSelection",
        "unmap_predicted_flow",
        "unmap_predicted_pairs",
        "unmap_predicted_channels",
    ],
    "ufm_tpu.utils.geometry": [
        # reference utils/geometry.py public functions
        "depthmap_to_camera_frame",
        "depthmap_to_world_frame",
        "xy_grid",
        "geotrf",
        "inv",
        "depthmap_to_pts3d",
        "get_meshgrid",
        "depthmap_to_camera_coordinates",
        "z_depthmap_to_norm_depthmap",
        "depthmap_to_absolute_camera_coordinates",
        "global_points_to_local",
        "project_points_to_pixels",
        "project_points_to_pixels_batched",
        "z_depthmap_to_norm_depthmap_batched",
        "colmap_to_opencv_intrinsics",
        "opencv_to_colmap_intrinsics",
        "get_joint_pointcloud_depth",
        "get_joint_pointcloud_center_scale",
        "find_reciprocal_matches",
        "rotate_vector_with_quaternion",
        "quaternion_to_rot_matrix",
    ],
    "ufm_tpu.utils.viz": [
        "warp_image_with_flow",
        "visualize_flow",
    ],
    # reference models/utils.py get_meshgrid_torch -> framework-native name
    "ufm_tpu.models.utils": ["get_meshgrid"],
}


@pytest.mark.parametrize("module_name", sorted(MANIFEST))
def test_reference_api_surface(module_name):
    mod = importlib.import_module(module_name)
    missing = [n for n in MANIFEST[module_name] if not hasattr(mod, n)]
    assert not missing, f"{module_name} lost reference-parity names: {missing}"


def test_prediction_entry_points():
    """The reference's user-facing prediction methods and constructors
    (uniflowmatch/models/base.py:269, ufm.py:120) must exist on each class."""
    import ufm_tpu.models as m

    for cls in (m.UniFlowMatch, m.UniFlowMatchConfidence, m.UniFlowMatchClassificationRefinement):
        assert hasattr(cls, "predict_correspondences_batched"), cls.__name__
        assert hasattr(cls, "from_pretrained"), cls.__name__
        assert hasattr(cls, "from_config"), cls.__name__
