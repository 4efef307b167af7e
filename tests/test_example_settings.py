"""Every example settings YAML must validate against its model.

Mirrors the reference's schema-coverage test (reference:
tests/test_example_settings.py:79-183): a file in settings/ without a mapping
here is a test failure, so new examples can't ship unvalidated.
"""

from pathlib import Path

import pytest
import yaml

from biahub_tpu.recon.settings import ReconstructionSettings
from biahub_tpu.settings import (
    CharacterizeSettings,
    ConcatenateSettings,
    DeconvolveSettings,
    DeskewSettings,
    EstimateRegistrationSettings,
    EstimateStabilizationSettings,
    FlatFieldCorrectionSettings,
    FusePipelineSettings,
    ProcessingImportFuncSettings,
    RegistrationSettings,
    SegmentationSettings,
    StabilizationSettings,
    StitchSettings,
    TrackingSettings,
)

SETTINGS_DIR = Path("settings")

# filename -> model (None = free-form config validated by its own verb)
SETTINGS_MODELS = {
    "example_deskew_settings.yml": DeskewSettings,
    "example_registration_settings.yml": RegistrationSettings,
    "example_stabilize_timelapse_settings.yml": StabilizationSettings,
    "example_concatenate_settings.yml": ConcatenateSettings,
    "example_concatenate_multi_position.yml": ConcatenateSettings,
    "example_concatenate_settings_organelle_dynamics.yml": ConcatenateSettings,
    "example_flat_field_settings.yml": FlatFieldCorrectionSettings,
    "example_deconvolve_settings.yml": DeconvolveSettings,
    "example_fuse_pipeline_settings.yml": FusePipelineSettings,
    "example_stitch_settings.yml": StitchSettings,
    "example_characterize_settings.yml": CharacterizeSettings,
    "example_segmentation_settings.yml": SegmentationSettings,
    "example_track_settings.yml": TrackingSettings,
    "example_process_with_config_settings.yml": ProcessingImportFuncSettings,
    "example_estimate_registration_settings.yml": EstimateRegistrationSettings,
    "example_estimate_registration_settings_manual.yml": EstimateRegistrationSettings,
    "example_estimate_registration_settings_beads.yml": EstimateRegistrationSettings,
    "example_estimate_stabilization_settings_xyz_pcc.yml": EstimateStabilizationSettings,
    "example_estimate_stabilization_settings_xyz_focus-finding.yml": EstimateStabilizationSettings,
    "example_estimate_stabilization_settings_xyz_beads.yml": EstimateStabilizationSettings,
    "example_estimate_stabilization_settings_xy_focus-finding.yml": EstimateStabilizationSettings,
    "example_estimate_stabilization_settings_z_focus-finding.yml": EstimateStabilizationSettings,
    "example_reconstruct_settings.yml": ReconstructionSettings,
    "example_virtual_stain_settings.yml": None,  # free-form (model-specific keys)
}


def test_all_example_settings_tested():
    """Fail when a settings/ YAML has no model mapping."""
    example_files = {p.name for p in SETTINGS_DIR.glob("*.yml")}
    unmapped = example_files - set(SETTINGS_MODELS)
    assert not unmapped, f"Example settings without a schema test: {sorted(unmapped)}"
    missing = set(SETTINGS_MODELS) - example_files
    assert not missing, f"Mapped example settings missing from settings/: {sorted(missing)}"


@pytest.mark.parametrize("filename,model", sorted(SETTINGS_MODELS.items(), key=lambda x: x[0]))
def test_example_settings_validate(filename, model):
    with open(SETTINGS_DIR / filename) as f:
        raw = yaml.safe_load(f)
    if model is None:
        assert isinstance(raw, dict)
        return
    instance = model(**raw)
    assert instance is not None


def test_fuse_output_shape_requires_warp_stage():
    """output_shape_zyx without a warp stage would be silently ignored —
    the model rejects it instead."""
    with pytest.raises(ValueError, match="output_shape_zyx"):
        FusePipelineSettings(
            deskew={
                "pixel_size_um": 0.116,
                "ls_angle_deg": 36.0,
                "px_to_scan_ratio": 0.38,
            },
            output_shape_zyx=[8, 16, 16],
        )
    # With a registration stage the same shape is accepted.
    ok = FusePipelineSettings(
        deskew={
            "pixel_size_um": 0.116,
            "ls_angle_deg": 36.0,
            "px_to_scan_ratio": 0.38,
        },
        registration={
            "affine_transform_zyx": [
                [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]
            ]
        },
        output_shape_zyx=[8, 16, 16],
    )
    assert ok.output_shape_zyx == [8, 16, 16]


def test_fuse_needs_at_least_one_stage():
    with pytest.raises(ValueError, match="at least one stage"):
        FusePipelineSettings()


def test_reference_name_compatibility_aliases():
    """Module-level names from the reference resolve here (PARITY.md)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from biahub_tpu.characterize_psf import (  # noqa: F401
        plot_fwhm_vs_acq_axes,
        plot_psf_amp,
        plot_psf_slices,
    )
    from biahub_tpu.cli.utils import (  # noqa: F401
        get_submitit_cluster,
        resolve_ome_zarr_version,
    )
    from biahub_tpu.deskew import fast_deskew_zyx  # noqa: F401
    from biahub_tpu.estimate_registration import user_assisted_registration
    from biahub_tpu.estimate_stabilization import (  # noqa: F401
        get_tform_from_pcc,
        plot_corr_max_min_sum,
        plot_cross_correlation,
        plot_pcc_drifts,
    )
    from biahub_tpu.flat_field import flat_field_correction  # noqa: F401
    from biahub_tpu.kernels.deconvolve import compute_tranfser_function  # noqa: F401
    from biahub_tpu.registration.beads import (  # noqa: F401
        estimate_independently,
        estimate_with_propagation,
    )
    from biahub_tpu.registration.utils import (  # noqa: F401
        apply_affine_transform,
        center_crop,
        find_lir,
        find_overlapping_volume,
        get_3D_fliplr_matrix,
        get_3D_rescaling_matrix,
        get_3D_rotation_matrix,
        get_aprox_transform,
        match_shape,
        pad_to_shape,
        rescale_voxel_size,
    )
    from biahub_tpu.track import run_cellpose_per_frame, run_ultrack  # noqa: F401
    from biahub_tpu.virtual_stain import load_predict_config, virtual_stain  # noqa: F401

    import numpy as np
    import pytest

    assert np.asarray(get_tform_from_pcc([1, 2, 3]))[2][3] == -3
    # Headless (no napari): the interactive flow refuses with a pointer to
    # the --source-points/--target-points file path.
    with pytest.raises(RuntimeError, match="napari"):
        user_assisted_registration(
            np.zeros((4, 8, 8), np.float32), "a", (1.0, 1.0, 1.0),
            np.zeros((4, 8, 8), np.float32), "b", (1.0, 1.0, 1.0),
        )


def test_biahub_import_alias():
    """Reference-style imports resolve through the biahub alias package."""
    import biahub
    from biahub.cli.utils import yaml_to_model  # noqa: F401
    from biahub.core.transform import Transform  # noqa: F401
    from biahub.deskew import fast_deskew_zyx, get_deskewed_data_shape  # noqa: F401
    from biahub.registration.ants import estimate  # noqa: F401
    from biahub.registration.utils import find_lir  # noqa: F401

    assert biahub.__version__
    shape, _ = get_deskewed_data_shape((8, 16, 32), 36.0, 0.5, True)
    assert shape == (16, 32, 29)
