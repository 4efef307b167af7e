"""Pydantic settings models — the YAML config surface of every CLI verb.

The field names, defaults, and validation behavior mirror the reference
implementation (reference: biahub/settings.py:22-737) so existing YAML config
files keep working unchanged. All models forbid unknown keys to guard against
typos, matching the reference's ``extra="forbid"`` policy.
"""

from pathlib import Path
from typing import Any, Literal

import numpy as np
from pydantic import (
    BaseModel,
    ConfigDict,
    Field,
    NonNegativeInt,
    PositiveFloat,
    PositiveInt,
    ValidationInfo,
    field_validator,
    model_validator,
)

__all__ = [
    "MyBaseModel",
    "DetectPeaksSettings",
    "ProcessingFunctions",
    "ProcessingImportFuncSettings",
    "ProcessingInputChannel",
    "CellposeConfig",
    "ZSlicing",
    "TrackingSettings",
    "EdgeGraphSettings",
    "CostMatrixSettings",
    "HungarianMatchSettings",
    "MatchDescriptorSettings",
    "FilterMatchesSettings",
    "QCBeadsRegistrationSettings",
    "BeadsMatchSettings",
    "PhaseCrossCorrSettings",
    "FocusFindingSettings",
    "StackRegSettings",
    "EvalTransformSettings",
    "AffineTransformSettings",
    "AntsRegistrationSettings",
    "ManualRegistrationSettings",
    "EstimateRegistrationSettings",
    "EstimateStabilizationSettings",
    "FlatFieldCorrectionSettings",
    "ProcessingSettings",
    "DeskewSettings",
    "RegistrationSettings",
    "PsfFromBeadsSettings",
    "DeconvolveSettings",
    "CharacterizeSettings",
    "ConcatenateSettings",
    "StabilizationSettings",
    "StitchSettings",
    "PreprocessingFunctions",
    "SegmentationModel",
    "SegmentationSettings",
]

OmeZarrVersion = Literal["0.4", "0.5"]

# A slice spec is "all", [start, end], or a per-path nesting of those.
SliceSpec = list | Literal["all"]


class MyBaseModel(BaseModel):
    """Base for all settings: unknown keys are an error, not silently ignored."""

    model_config = ConfigDict(extra="forbid")


def _require_4x4(value, name: str):
    arr = np.asarray(value, dtype=object)
    if arr.shape != (4, 4):
        raise ValueError(f"{name} must be a 4x4 matrix (list of 4 lists of 4 numbers)")
    try:
        np.asarray(value, dtype=float)
    except (TypeError, ValueError):
        raise ValueError(f"{name} must contain valid numerical values") from None


def _validate_slice_spec(v):
    """Validate a Z/Y/X slice spec: 'all', [start, end], or nested per-path lists.

    Mirrors the accepted grammar of the reference's ConcatenateSettings slice
    validator (reference: biahub/settings.py:481-567).
    """
    if v == "all":
        return v
    if not isinstance(v, list):
        raise ValueError("Slice must be 'all' or a list.")

    def check_pair(pair):
        ok = (
            isinstance(pair, list)
            and len(pair) == 2
            and all(isinstance(i, int) for i in pair)
        )
        if not ok:
            raise ValueError(
                "Each slice item must be 'all' or a list of two non-negative "
                "integers [start, end]."
            )
        if not all(i >= 0 for i in pair):
            raise ValueError("Slice indices must be non-negative integers.")

    # Simple [start, end]
    if len(v) == 2 and all(isinstance(i, int) for i in v):
        check_pair(v)
        return v

    # Per-path list: each item is 'all', [start, end], or a list of those
    for item in v:
        if item == "all":
            continue
        if isinstance(item, list) and len(item) == 2 and all(isinstance(i, int) for i in item):
            check_pair(item)
            continue
        if isinstance(item, list):
            for sub in item:
                if sub == "all":
                    continue
                check_pair(sub)
            continue
        raise ValueError(
            "Each item in a per-path slice list must be 'all' or a valid slice "
            "specification."
        )
    return v


def _slice_length_ok(spec, n_paths: int) -> bool:
    if spec == "all" or not isinstance(spec, list):
        return True
    if len(spec) == 2 and all(isinstance(i, int) for i in spec):
        return True
    return len(spec) == n_paths


# ---------------------------------------------------------------------------
# Peak detection, graph matching, and beads registration
# ---------------------------------------------------------------------------


class DetectPeaksSettings(MyBaseModel):
    threshold_abs: float = 110
    nms_distance: int = 16
    min_distance: int = 0
    block_size: list[int] = [8, 8, 8]


class EdgeGraphSettings(BaseModel):
    method: Literal["knn", "radius", "full"] = "knn"
    k: int | None = None
    radius: float | None = None

    @model_validator(mode="after")
    def _apply_method_defaults(self) -> "EdgeGraphSettings":
        # Only the fields of the selected method are meaningful; the others are
        # cleared so two configs that differ only in ignored fields hash alike.
        if self.method == "knn":
            self.k = 5 if self.k is None else self.k
            self.radius = None
        elif self.method == "radius":
            self.radius = 30.0 if self.radius is None else self.radius
            self.k = None
        else:  # full
            self.k = None
            self.radius = None
        return self


class CostMatrixSettings(MyBaseModel):
    weights: dict[str, float] = {
        "dist": 0.5,
        "edge_angle": 1.0,
        "edge_length": 1.0,
        "pca_dir": 0.0,
        "pca_aniso": 0.0,
        "edge_descriptor": 0.0,
    }
    normalize: bool = False


class HungarianMatchSettings(MyBaseModel):
    distance_metric: Literal["euclidean", "cosine", "cityblock"] = "euclidean"
    cost_threshold: float = 0.10
    max_ratio: float = 0.8
    cross_check: bool = False
    edge_graph_settings: EdgeGraphSettings = EdgeGraphSettings()
    cost_matrix_settings: CostMatrixSettings = CostMatrixSettings()


class MatchDescriptorSettings(MyBaseModel):
    distance_metric: Literal["euclidean", "cosine", "cityblock"] = "euclidean"
    max_ratio: float = 0.8
    cross_check: bool = False


class FilterMatchesSettings(MyBaseModel):
    angle_threshold: float = 0
    direction_threshold: float = 0
    min_distance_quantile: float = 0.01
    max_distance_quantile: float = 0.95


class QCBeadsRegistrationSettings(MyBaseModel):
    iterations: int = 2
    score_threshold: float = 0.40
    score_centroid_mask_radius: int = 6


class BeadsMatchSettings(MyBaseModel):
    algorithm: Literal["hungarian", "match_descriptor"] = "hungarian"
    source_peaks_settings: DetectPeaksSettings | None = Field(
        default_factory=DetectPeaksSettings
    )
    target_peaks_settings: DetectPeaksSettings | None = Field(
        default_factory=DetectPeaksSettings
    )
    match_descriptor_settings: MatchDescriptorSettings = MatchDescriptorSettings()
    hungarian_match_settings: HungarianMatchSettings = HungarianMatchSettings()
    filter_matches_settings: FilterMatchesSettings = FilterMatchesSettings()
    qc_settings: QCBeadsRegistrationSettings = QCBeadsRegistrationSettings()


# ---------------------------------------------------------------------------
# Stabilization / registration estimation
# ---------------------------------------------------------------------------


class PhaseCrossCorrSettings(MyBaseModel):
    normalization: Literal["magnitude", "classic"] | None = None
    maximum_shift: float = 1.2
    function_type: Literal["custom_padding", "custom"] = "custom"
    t_reference: Literal["first", "previous"] = "first"
    skip_beads_fov: str = "0"
    center_crop_xy: list[int] | None = None
    X_slice: SliceSpec = "all"
    Y_slice: SliceSpec = "all"
    Z_slice: SliceSpec = "all"


class FocusFindingSettings(MyBaseModel):
    average_across_wells: bool = False
    average_across_wells_method: Literal["mean", "median"] = "mean"
    skip_beads_fov: str = "0"
    center_crop_xy: list[int] = [800, 800]


class StackRegSettings(MyBaseModel):
    center_crop_xy: list[int] = [800, 800]
    skip_beads_fov: str = "0"
    focus_finding_settings: FocusFindingSettings | None = Field(
        default_factory=FocusFindingSettings
    )
    t_reference: Literal["first", "previous"] = "first"


class EvalTransformSettings(MyBaseModel):
    validation_window_size: int = 10
    validation_tolerance: float = 1000.0
    interpolation_window_size: int = 3
    interpolation_type: Literal["linear", "cubic"] = "linear"


class AffineTransformSettings(MyBaseModel):
    t_reference: Literal["first", "previous"] = "first"
    transform_type: Literal["euclidean", "similarity", "affine"] = "euclidean"
    approx_transform: list = np.eye(4).tolist()
    use_prev_t_transform: bool = True
    compute_approx_transform: bool = False

    @field_validator("approx_transform")
    @classmethod
    def _check_approx(cls, v):
        if v is not None:
            if not isinstance(v, list):
                raise ValueError("approx_transform must be a list")
            _require_4x4(v, "approx_transform")
        return v


class AntsRegistrationSettings(MyBaseModel):
    sobel_filter: bool = False


class ManualRegistrationSettings(MyBaseModel):
    time_index: int = 0
    affine_90degree_rotation: int = 0
    affine_fliplr: bool = False


class EstimateRegistrationSettings(MyBaseModel):
    target_channel_name: str
    source_channel_name: str
    estimation_method: Literal["manual", "beads", "ants"] = "manual"
    beads_match_settings: BeadsMatchSettings | None = None
    focus_finding_settings: FocusFindingSettings | None = None
    affine_transform_settings: AffineTransformSettings = Field(
        default_factory=AffineTransformSettings
    )
    eval_transform_settings: EvalTransformSettings | None = None
    ants_registration_settings: AntsRegistrationSettings | None = None
    manual_registration_settings: ManualRegistrationSettings | None = None
    verbose: bool = False

    @model_validator(mode="after")
    def _default_method_settings(self) -> "EstimateRegistrationSettings":
        if self.estimation_method == "manual" and self.manual_registration_settings is None:
            self.manual_registration_settings = ManualRegistrationSettings()
        elif self.estimation_method == "beads" and self.beads_match_settings is None:
            self.beads_match_settings = BeadsMatchSettings()
        elif self.estimation_method == "ants" and self.ants_registration_settings is None:
            self.ants_registration_settings = AntsRegistrationSettings()
        return self


class EstimateStabilizationSettings(MyBaseModel):
    stabilization_estimation_channel: str
    stabilization_channels: list
    stabilization_type: Literal["z", "xy", "xyz"]
    stabilization_method: Literal["beads", "phase-cross-corr", "focus-finding"] = (
        "focus-finding"
    )
    beads_match_settings: BeadsMatchSettings | None = None
    phase_cross_corr_settings: PhaseCrossCorrSettings | None = None
    stack_reg_settings: StackRegSettings | None = None
    focus_finding_settings: FocusFindingSettings | None = None
    affine_transform_settings: AffineTransformSettings = Field(
        default_factory=AffineTransformSettings
    )
    eval_transform_settings: EvalTransformSettings | None = None
    verbose: bool = False

    @model_validator(mode="after")
    def _default_method_settings(self) -> "EstimateStabilizationSettings":
        method, kind = self.stabilization_method, self.stabilization_type
        if method == "beads" and self.beads_match_settings is None:
            self.beads_match_settings = BeadsMatchSettings()
        elif method == "phase-cross-corr" and self.phase_cross_corr_settings is None:
            self.phase_cross_corr_settings = PhaseCrossCorrSettings()
        elif method == "focus-finding":
            if kind in ("z", "xyz") and self.focus_finding_settings is None:
                self.focus_finding_settings = FocusFindingSettings()
            if kind in ("xy", "xyz") and self.stack_reg_settings is None:
                self.stack_reg_settings = StackRegSettings()
        return self


# ---------------------------------------------------------------------------
# Compute verbs
# ---------------------------------------------------------------------------


class FlatFieldCorrectionSettings(MyBaseModel):
    channel_names: list[str] | None = None
    # When None, preserve the OME-Zarr version of the input store.
    output_ome_zarr_version: OmeZarrVersion | None = None


class ProcessingSettings(MyBaseModel):
    fliplr: bool | None = False
    flipud: bool | None = False
    rot90: int | None = 0


class DeskewSettings(MyBaseModel):
    pixel_size_um: PositiveFloat
    ls_angle_deg: PositiveFloat
    px_to_scan_ratio: PositiveFloat | None = None
    scan_step_um: PositiveFloat | None = None
    keep_overhang: bool = False
    # Default must be a float literal: field_validator does not run on
    # defaults, and an int 0 trips a Pydantic serializer warning on every
    # model_dump (provenance stamping) against the Literal["mean"] arm.
    overhang_fill: Literal["mean"] | float = 0.0
    average_n_slices: PositiveInt = 3

    @field_validator("overhang_fill")
    @classmethod
    def _coerce_fill(cls, v):
        # ints serialize cleanly as floats (0 vs 0.0 would warn on dump)
        return float(v) if not isinstance(v, str) else v
    device: str = "cpu"
    output_ome_zarr_version: OmeZarrVersion | None = None

    @field_validator("ls_angle_deg")
    @classmethod
    def _check_angle(cls, v):
        if v < 0 or v > 45:
            raise ValueError("Light sheet angle must be be between 0 and 45 degrees")
        return round(float(v), 2)

    @field_validator("px_to_scan_ratio")
    @classmethod
    def _round_ratio(cls, v):
        if v is not None:
            return round(float(v), 3)

    def __init__(self, **data):
        # px_to_scan_ratio may be given directly or derived from the physical
        # pixel and scan-step sizes (reference: biahub/settings.py:373-383).
        if data.get("px_to_scan_ratio") is None:
            if data.get("scan_step_um") is not None:
                data["px_to_scan_ratio"] = round(
                    data["pixel_size_um"] / data["scan_step_um"], 3
                )
            else:
                raise ValueError(
                    "If px_to_scan_ratio is not provided, both pixel_size_um and "
                    "scan_step_um must be provided"
                )
        super().__init__(**data)


class RegistrationSettings(MyBaseModel):
    source_channel_names: list[str]
    target_channel_name: str
    affine_transform_zyx: list
    keep_overhang: bool = False
    interpolation: str = "linear"
    time_indices: NonNegativeInt | list[NonNegativeInt] | Literal["all"] = "all"
    verbose: bool = False
    output_ome_zarr_version: OmeZarrVersion | None = None

    @field_validator("affine_transform_zyx")
    @classmethod
    def _check_matrix(cls, v):
        if not isinstance(v, list) or len(v) != 4:
            raise ValueError("affine_transform_zyx must be a 4x4 matrix as a list of rows")
        for row in v:
            if not isinstance(row, list) or len(row) != 4:
                raise ValueError("Each row of affine_transform_zyx must have 4 entries")
        _require_4x4(v, "affine_transform_zyx")
        return v


class PsfFromBeadsSettings(MyBaseModel):
    axis0_patch_size: PositiveInt = 101
    axis1_patch_size: PositiveInt = 101
    axis2_patch_size: PositiveInt = 101


class DeconvolveSettings(MyBaseModel):
    regularization_strength: PositiveFloat = 0.001
    output_ome_zarr_version: OmeZarrVersion | None = None


class CharacterizeSettings(MyBaseModel):
    block_size: list[NonNegativeInt] = (64, 64, 32)
    blur_kernel_size: NonNegativeInt = 3
    nms_distance: NonNegativeInt = 32
    min_distance: NonNegativeInt = 50
    threshold_abs: PositiveFloat = 200.0
    max_num_peaks: NonNegativeInt = 2000
    exclude_border: list[NonNegativeInt] = (5, 10, 5)
    device: str = "cuda"
    patch_size: tuple[PositiveFloat, PositiveFloat, PositiveFloat] | None = None
    axis_labels: list[str] = ["AXIS0", "AXIS1", "AXIS2"]
    offset: float = 0.0
    gain: float = 1.0
    use_robust_1d_fwhm: bool = False
    fwhm_plot_type: Literal["1D", "3D"] = "3D"

    @field_validator("device")
    @classmethod
    def _resolve_device(cls, v):
        # The reference resolves "cuda" to the available torch device
        # (reference: biahub/settings.py:446-449); here the accelerator is the
        # default JAX backend, so any value resolves to it at kernel-call time.
        return v


class ConcatenateSettings(MyBaseModel):
    concat_data_paths: list[str]
    time_indices: int | list[int] | Literal["all"] = "all"
    channel_names: list[str | list[str]]
    X_slice: SliceSpec = "all"
    Y_slice: SliceSpec = "all"
    Z_slice: SliceSpec = "all"
    chunks_czyx: Literal[None] | list[int] = None
    shards_ratio: list[int] | None = None
    ensure_unique_positions: bool | None = False
    # Concatenate is the migration path into v0.5 stores, so it defaults to
    # "0.5" (reference: biahub/settings.py:462-465).
    output_ome_zarr_version: OmeZarrVersion | None = "0.5"

    @field_validator("concat_data_paths")
    @classmethod
    def _check_paths(cls, v):
        if not isinstance(v, list) or not all(isinstance(p, str) for p in v):
            raise ValueError("concat_data_paths must be a list of positions.")
        return v

    @field_validator("channel_names")
    @classmethod
    def _check_channels(cls, v):
        if not isinstance(v, list) or not all(isinstance(n, (str, list)) for n in v):
            raise ValueError("channel_names must be a list of strings or lists of strings.")
        return v

    @field_validator("X_slice", "Y_slice", "Z_slice")
    @classmethod
    def _check_slices(cls, v):
        return _validate_slice_spec(v)

    @field_validator("chunks_czyx")
    @classmethod
    def _check_chunks(cls, v):
        if v is not None and (
            not isinstance(v, list) or len(v) != 4 or not all(isinstance(i, int) for i in v)
        ):
            raise ValueError("chunks_czyx must be a list of 4 integers (C, Z, Y, X)")
        return v

    @model_validator(mode="after")
    def _check_slice_lengths(self):
        n = len(self.concat_data_paths)
        if n:
            for name in ("X_slice", "Y_slice", "Z_slice"):
                if not _slice_length_ok(getattr(self, name), n):
                    raise ValueError(
                        f"{name} must be 'all', a single slice specification, or a "
                        f"list with the same length as concat_data_paths ({n})"
                    )
        return self


class StabilizationSettings(MyBaseModel):
    stabilization_estimation_channel: str
    stabilization_type: Literal["z", "xy", "xyz", "affine"]
    stabilization_method: Literal[
        "beads", "phase-cross-corr", "focus-finding", "manual", "ants"
    ] = "focus-finding"
    stabilization_channels: list
    affine_transform_zyx_list: list
    time_indices: NonNegativeInt | list[NonNegativeInt] | Literal["all"] = "all"
    output_voxel_size: list[PositiveFloat] = [1.0, 1.0, 1.0, 1.0, 1.0]
    output_ome_zarr_version: OmeZarrVersion | None = None

    @field_validator("affine_transform_zyx_list")
    @classmethod
    def _check_matrix_list(cls, v):
        if not isinstance(v, list):
            raise ValueError("affine_transform_zyx_list must be a list")
        for arr in v:
            _require_4x4(arr, "each element of affine_transform_zyx_list")
        return v


class FuseWarpSettings(MyBaseModel):
    """One 4x4 affine for the fused pipeline's registration stage.

    A trimmed :class:`RegistrationSettings` — the fused pipeline warps every
    channel of one input store (there is no separate source/target store to
    name channels from), so only the matrix remains.
    """

    affine_transform_zyx: list

    @field_validator("affine_transform_zyx")
    @classmethod
    def _check_matrix(cls, v):
        _require_4x4(v, "affine_transform_zyx")
        return v


class FuseStabilizeSettings(MyBaseModel):
    """Per-timepoint 4x4 affines for the fused pipeline's stabilize stage.

    ``affine_transform_zyx_list[t]`` applies to raw timepoint ``t`` — the
    same indexing contract as :class:`StabilizationSettings`.
    """

    affine_transform_zyx_list: list

    @field_validator("affine_transform_zyx_list")
    @classmethod
    def _check_matrix_list(cls, v):
        if not isinstance(v, list) or not v:
            raise ValueError("affine_transform_zyx_list must be a non-empty list")
        for arr in v:
            _require_4x4(arr, "each element of affine_transform_zyx_list")
        return v


class FusePipelineSettings(MyBaseModel):
    """Multi-verb fused pipeline: deconvolve -> deskew -> register/stabilize.

    Each stage is optional (at least one required); enabled stages run as ONE
    device program per (t, c) volume — no intermediate zarr stores between
    verbs (the reference pipeline materializes a plate after every step,
    reference: nextflow/mantis-v2.nf:56-67). Stage sub-configs reuse the
    per-verb schemas where they transfer verbatim (deconvolve, deskew).
    """

    flat_field: FlatFieldCorrectionSettings | None = None
    deconvolve: DeconvolveSettings | None = None
    deskew: DeskewSettings | None = None
    registration: FuseWarpSettings | None = None
    stabilization: FuseStabilizeSettings | None = None
    time_indices: NonNegativeInt | list[NonNegativeInt] | Literal["all"] = "all"
    output_shape_zyx: list[NonNegativeInt] | None = None
    output_ome_zarr_version: OmeZarrVersion | None = None

    @model_validator(mode="after")
    def _check_stages(self):
        if not any(
            (self.flat_field, self.deconvolve, self.deskew, self.registration,
             self.stabilization)
        ):
            raise ValueError(
                "FusePipelineSettings needs at least one stage (flat_field / "
                "deconvolve / deskew / registration / stabilization)"
            )
        if self.output_shape_zyx is not None and len(self.output_shape_zyx) != 3:
            raise ValueError("output_shape_zyx must have 3 entries (Z, Y, X)")
        if self.output_shape_zyx is not None and not any(
            (self.registration, self.stabilization)
        ):
            # Without a warp stage the output frame IS the (deskewed) input
            # frame; a resize here would otherwise be silently ignored.
            raise ValueError(
                "output_shape_zyx only applies to the warp stage — add a "
                "registration or stabilization block, or drop it"
            )
        return self


class StitchSettings(BaseModel):
    channels: list[str] | None = None
    total_translation: dict[str, list[float]] | None = None
    affine_transform: dict[str, list] | None = None
    output_ome_zarr_version: OmeZarrVersion | None = None

    def __init__(self, **data):
        # Back-compat: (y, x) translations get a leading z=0
        # (reference: biahub/settings.py:660-674).
        if "total_translation" in data and data["total_translation"] is not None:
            for key, value in data["total_translation"].items():
                if len(value) == 2:
                    data["total_translation"][key] = [0] + value
        if not any((data.get("total_translation"), data.get("affine_transform"))):
            raise ValueError("Either affine_transform or total_translation must be provided")
        super().__init__(**data)


# ---------------------------------------------------------------------------
# Generic processing, segmentation, and tracking
# ---------------------------------------------------------------------------


class ProcessingFunctions(MyBaseModel):
    function: str
    input_channels: list[str] | None = None
    kwargs: dict[str, Any] = {}
    per_timepoint: bool | None = True


class ProcessingImportFuncSettings(MyBaseModel):
    processing_functions: list[ProcessingFunctions] = []
    output_ome_zarr_version: OmeZarrVersion | None = None


class ProcessingInputChannel(MyBaseModel):
    path: Path | None = None
    channels: dict[str, list[ProcessingFunctions]]

    @field_validator("path")
    @classmethod
    def _check_zarr_path(cls, v):
        if v is None:
            return v
        v = Path(v)
        if v.suffix != ".zarr":
            raise ValueError("Path must be a valid OME-Zarr dataset.")
        return v


class CellposeConfig(MyBaseModel):
    """Cellpose segmentation parameters used as tracking input."""

    model_type: str = "nuclei"
    diameter: float = 80
    cellprob_threshold: float = 0.0
    flow_threshold: float = 0.4
    gpu: bool = True
    min_size: int = 500
    input_channel: str = "nuclei_prediction"
    labels_sigma: float = 5.0


class ZSlicing(MyBaseModel):
    """How to select the Z-planes used for tracking.

    ``method`` decides which fields apply (reference: biahub/settings.py:74-103):
    "all" keeps every plane, "central" takes an automatically centred window,
    "range" uses the explicit [start, stop] window, "focus" finds the in-focus
    plane per FOV and takes ``window_size`` planes split frac_below/frac_above.
    """

    method: Literal["all", "central", "range", "focus"] = "all"
    range: tuple[int, int] | None = None
    window_size: int = 48
    frac_below: float = 1 / 3
    frac_above: float = 2 / 3
    focus_channel: str | None = None


class TrackingSettings(MyBaseModel):
    target_channel: str = "nuclei_prediction"
    fov: str = "*/*/*"
    blank_frames_path: Path | None = None
    output_mode: Literal["2D", "3D"] = "2D"
    z_slicing: ZSlicing = ZSlicing()
    input_images: list[ProcessingInputChannel]
    tracking_config: dict[str, Any] = {}
    segmentation_method: Literal["foreground_contour", "cellpose"] = "foreground_contour"
    cellpose_config: CellposeConfig | None = None
    output_ome_zarr_version: OmeZarrVersion | None = None

    @field_validator("blank_frames_path")
    @classmethod
    def _coerce_path(cls, v):
        return None if v is None else Path(v)


class PreprocessingFunctions(BaseModel):
    function: str
    channel: str
    kwargs: dict[str, Any] = {}


class SegmentationModel(BaseModel):
    path_to_model: str
    eval_args: dict[str, Any]
    z_slice_2D: int | None = None
    preprocessing: list[PreprocessingFunctions] = []

    @field_validator("eval_args", mode="before")
    @classmethod
    def _check_eval_args(cls, value):
        # The reference validates keys against cellpose's eval() signature
        # (reference: biahub/settings.py:704-717). cellpose is an optional
        # heavyweight dependency here; when it is absent the keys are accepted
        # and validated at segmentation time instead.
        try:
            from cellpose import models  # type: ignore
        except ImportError:
            return value
        code = models.CellposeModel.eval.__code__
        valid = code.co_varnames[: code.co_argcount]
        invalid = [a for a in value if a not in valid]
        if invalid:
            raise ValueError(
                f"Invalid eval arguments provided: {invalid}. Allowed arguments are {valid}"
            )
        return value

    @field_validator("z_slice_2D")
    @classmethod
    def _check_z_slice(cls, z_slice_2D, info: ValidationInfo):
        if z_slice_2D is not None:
            eval_args = info.data.get("eval_args", {})
            if eval_args.get("do_3D", None):
                raise ValueError(
                    "If 'z_slice_2D' is provided, 'do_3D' in 'eval_args' must be set "
                    "to False."
                )
            return 0
        return z_slice_2D


class SegmentationSettings(BaseModel):
    models: dict[str, SegmentationModel]
    output_ome_zarr_version: OmeZarrVersion | None = None
    model_config = {"extra": "forbid", "protected_namespaces": ()}


def get_valid_eval_args():
    """Valid keyword names of cellpose's ``CellposeModel.eval``
    (reference: biahub/settings.py:677-689); requires the optional cellpose
    package."""
    try:
        from cellpose import models  # type: ignore

        code = models.CellposeModel.eval.__code__
        return code.co_varnames[: code.co_argcount]
    except ImportError:
        raise ImportError(
            "The 'cellpose' package is required to validate 'eval_args' in "
            "cellpose model configurations."
        ) from None
