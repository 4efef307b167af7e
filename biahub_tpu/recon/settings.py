"""Reconstruction config schema, mirroring waveorder's CLI settings surface.

Mirrors the waveorder reconstruction YAML surface the reference's
reconstruct verbs consume (reference: biahub/compute_transfer_function.py,
biahub/apply_inverse_transfer_function.py, example configs in settings/).

Field names follow waveorder's ReconstructionSettings (the YAML files users
already have keep working): top-level ``input_channel_names``,
``reconstruction_dimension``, and per-modality ``transfer_function`` /
``apply_inverse`` blocks.
"""

from __future__ import annotations

from typing import Literal

from pydantic import BaseModel, ConfigDict, Field, NonNegativeInt, PositiveFloat


class _Base(BaseModel):
    model_config = ConfigDict(extra="forbid")


class BirefringenceTransferFunctionSettings(_Base):
    swing: float = 0.1


class BirefringenceApplyInverseSettings(_Base):
    wavelength_illumination: PositiveFloat = 0.532
    background_path: str = ""
    remove_estimated_background: bool = False
    flip_orientation: bool = False
    rotate_orientation: bool = False


class BirefringenceSettings(_Base):
    transfer_function: BirefringenceTransferFunctionSettings = Field(
        default_factory=BirefringenceTransferFunctionSettings
    )
    apply_inverse: BirefringenceApplyInverseSettings = Field(
        default_factory=BirefringenceApplyInverseSettings
    )


class PhaseTransferFunctionSettings(_Base):
    wavelength_illumination: PositiveFloat = 0.532
    yx_pixel_size: PositiveFloat = 0.325
    z_pixel_size: PositiveFloat = 2.0
    z_padding: NonNegativeInt = 0
    index_of_refraction_media: PositiveFloat = 1.3
    numerical_aperture_detection: PositiveFloat = 1.2
    numerical_aperture_illumination: PositiveFloat = 0.52
    invert_phase_contrast: bool = False


class PhaseApplyInverseSettings(_Base):
    reconstruction_algorithm: Literal["Tikhonov", "TV"] = "Tikhonov"
    regularization_strength: PositiveFloat = 0.001
    TV_rho_strength: PositiveFloat = 0.001
    TV_iterations: NonNegativeInt = 1


class PhaseSettings(_Base):
    transfer_function: PhaseTransferFunctionSettings = Field(
        default_factory=PhaseTransferFunctionSettings
    )
    apply_inverse: PhaseApplyInverseSettings = Field(
        default_factory=PhaseApplyInverseSettings
    )


class FluorescenceTransferFunctionSettings(_Base):
    wavelength_emission: PositiveFloat = 0.507
    yx_pixel_size: PositiveFloat = 0.325
    z_pixel_size: PositiveFloat = 2.0
    z_padding: NonNegativeInt = 0
    index_of_refraction_media: PositiveFloat = 1.3
    numerical_aperture_detection: PositiveFloat = 1.2


class FluorescenceApplyInverseSettings(_Base):
    reconstruction_algorithm: Literal["Tikhonov", "TV"] = "Tikhonov"
    regularization_strength: PositiveFloat = 0.001
    TV_rho_strength: PositiveFloat = 0.001
    TV_iterations: NonNegativeInt = 1


class FluorescenceSettings(_Base):
    transfer_function: FluorescenceTransferFunctionSettings = Field(
        default_factory=FluorescenceTransferFunctionSettings
    )
    apply_inverse: FluorescenceApplyInverseSettings = Field(
        default_factory=FluorescenceApplyInverseSettings
    )


class ReconstructionSettings(_Base):
    input_channel_names: list[str] = ["BF"]
    time_indices: int | list[int] | Literal["all"] = "all"
    reconstruction_dimension: Literal[2, 3] = 3
    birefringence: BirefringenceSettings | None = None
    phase: PhaseSettings | None = None
    fluorescence: FluorescenceSettings | None = None

    def output_channel_names(self) -> list[str]:
        """Reconstructed channel names, matching waveorder's output ordering."""
        names: list[str] = []
        if self.birefringence is not None:
            names += ["Retardance", "Orientation", "BF", "Pol"]
        if self.phase is not None:
            names += [f"Phase{self.reconstruction_dimension}D"]
        if self.fluorescence is not None:
            names += [f"{name}_decon" for name in self.input_channel_names]
        return names
