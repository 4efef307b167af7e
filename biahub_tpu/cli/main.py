"""The ``biahub`` CLI: a lazy registry of all verbs.

Command names and help strings mirror the reference registry
(reference: biahub/cli/main.py:51-224) so scripts and Nextflow pipelines that
shell out to ``biahub <verb>`` keep working. Imports are deferred until a
command is invoked — ``biahub --help`` never pays for JAX startup.
"""

import importlib

import click

CONTEXT = {"help_option_names": ["-h", "--help"]}


class NaturalOrderGroup(click.Group):
    def list_commands(self, ctx):
        return list(self.commands.keys())


@click.group(context_settings=CONTEXT, cls=NaturalOrderGroup)
def cli():
    """command-line tools for biahub."""


def _init_distributed_for_run() -> None:
    """Bring up jax.distributed when the environment asks for it.

    Called from LazyCommand.invoke — i.e. only when a verb actually
    executes, so ``--help`` never blocks on (or crashes over) coordinator
    bring-up. Multi-host runs launch the same verb on every host; the
    runtime must come up before the first JAX computation.
    """
    import os

    if os.environ.get("BIAHUB_TPU_COORDINATOR") or os.environ.get(
        "BIAHUB_TPU_DISTRIBUTED"
    ):
        from biahub_tpu.parallel.distributed import maybe_initialize_distributed

        try:
            maybe_initialize_distributed()
        except RuntimeError as exc:
            raise click.ClickException(str(exc)) from exc


class LazyCommand(click.Command):
    def __init__(self, name, import_path, help=None, short_help=None):
        self.import_path = import_path
        self._real_command = None
        super().__init__(name=name, help=help, short_help=short_help)

    def _load(self):
        if self._real_command is None:
            module_path, attr_name = self.import_path.rsplit(".", 1)
            module = importlib.import_module(module_path)
            self._real_command = getattr(module, attr_name)

    def invoke(self, ctx):
        self._load()
        _init_distributed_for_run()
        return self._real_command.invoke(ctx)

    def get_help(self, ctx):
        self._load()
        return self._real_command.get_help(ctx)

    def get_params(self, ctx):
        self._load()
        return self._real_command.get_params(ctx)

    def format_usage(self, ctx, formatter):
        self._load()
        return self._real_command.format_usage(ctx, formatter)

    def format_options(self, ctx, formatter):
        self._load()
        return self._real_command.format_options(ctx, formatter)


COMMANDS = [
    ("estimate-bleaching", "biahub_tpu.estimate_bleaching.estimate_bleaching_cli",
     "Estimate bleaching from raw data"),
    ("estimate-deskew", "biahub_tpu.estimate_deskew.estimate_deskew_cli",
     "Routine for estimating deskewing parameters"),
    ("deskew", "biahub_tpu.deskew.deskew_cli",
     "Deskew a single position across T and C axes"),
    ("estimate-registration", "biahub_tpu.estimate_registration.estimate_registration_cli",
     "Estimate affine transform between timepoints or arms"),
    ("flat-field", "biahub_tpu.flat_field.flat_field_cli",
     "Apply flat field correction to selected channels"),
    ("flip", "biahub_tpu.flip.flip_cli",
     "Flip images in a dataset"),
    ("optimize-registration", "biahub_tpu.optimize_registration.optimize_registration_cli",
     "Optimize transform based on match filtering"),
    ("pyramid", "biahub_tpu.pyramid.pyramid_cli",
     "Create pyramid levels for a dataset"),
    ("register", "biahub_tpu.register.register_cli",
     "Apply an affine transformation to a single position"),
    ("estimate-stitch", "biahub_tpu.estimate_stitch.estimate_stitch_cli",
     "Estimate stitching parameters for positions"),
    ("stitch", "biahub_tpu.stitch.stitch_cli",
     "Stitch positions in wells of a zarr store"),
    ("concatenate", "biahub_tpu.concatenate.concatenate_cli",
     "Concatenate datasets (with optional cropping)"),
    ("estimate-stabilization", "biahub_tpu.estimate_stabilization.estimate_stabilization_cli",
     "Estimate translation matrices for XYZ stabilization"),
    ("stabilize", "biahub_tpu.stabilize.stabilize_cli",
     "Apply stabilization transforms to dataset"),
    ("estimate-crop", "biahub_tpu.estimate_crop.estimate_crop_cli",
     "Estimate crop region for dual-channel alignment"),
    ("compute-tf", "biahub_tpu.compute_transfer_function.compute_transfer_function_cli",
     "Compute transfer function using PSF"),
    ("apply-inv-tf", "biahub_tpu.apply_inverse_transfer_function.apply_inverse_transfer_function_cli",
     "Apply inverse transfer function to dataset"),
    ("reconstruct", "biahub_tpu.reconstruct.reconstruct_cli",
     "Reconstruct a dataset using config"),
    ("fuse", "biahub_tpu.fuse.fuse_cli",
     "Fuse deconvolve/deskew/warps into one device program"),
    ("estimate-psf", "biahub_tpu.estimate_psf.estimate_psf_cli",
     "Estimate point spread function from beads"),
    ("deconvolve", "biahub_tpu.deconvolve.deconvolve_cli",
     "Deconvolve across T and C axes using a PSF"),
    ("characterize-psf", "biahub_tpu.characterize_psf.characterize_psf_cli",
     "Characterize point spread function (PSF)"),
    ("segment", "biahub_tpu.segment.segment_cli",
     "Segment a position using pretrained model or pipeline"),
    ("virtual-stain", "biahub_tpu.virtual_stain.virtual_stain_cli",
     "Run virtual staining"),
    ("process-with-config", "biahub_tpu.process_data.process_with_config_cli",
     "Process data with YAML-defined functions"),
    ("track", "biahub_tpu.track.track_cli",
     "Track objects in 2D/3D time-lapse microscopy"),
    ("check-disk-space", "biahub_tpu.cli.disk.check_disk_space_cli",
     "Check disk space using du -sb"),
    ("crop-background", "biahub_tpu.visualize.crop_background.main",
     "Crop video backgrounds with ffmpeg"),
]


for name, import_path, help_text in COMMANDS:
    cli.add_command(
        LazyCommand(
            name=name,
            import_path=import_path,
            help=help_text,
            short_help=help_text.split(".")[0],
        )
    )


class LazyGroup(click.Group):
    """Click group that defers import until invoked."""

    def __init__(self, name, import_path, **kwargs):
        self.import_path = import_path
        self._real_group = None
        super().__init__(name=name, **kwargs)

    def _load(self):
        if self._real_group is None:
            module_path, attr_name = self.import_path.rsplit(".", 1)
            module = importlib.import_module(module_path)
            self._real_group = getattr(module, attr_name)

    def list_commands(self, ctx):
        self._load()
        return self._real_group.list_commands(ctx)

    def get_command(self, ctx, cmd_name):
        self._load()
        return self._real_group.get_command(ctx, cmd_name)

    def invoke(self, ctx):
        self._load()
        _init_distributed_for_run()
        return self._real_group.invoke(ctx)

    def get_help(self, ctx):
        self._load()
        return self._real_group.get_help(ctx)


cli.add_command(
    LazyGroup(name="nf", import_path="biahub_tpu.cli.nf.nf_cli", help="Nextflow utilities")
)


if __name__ == "__main__":
    cli()
