"""Shared click option decorators — the reference's CLI surface, preserved.

Option names, flags, and validation semantics follow the reference
(reference: biahub/cli/parsing.py:14-338): multi-path globs via an
eat-all option, positions-not-plates validation, sbatch override files
accepted for compatibility.
"""

from __future__ import annotations

import glob
import re
from collections.abc import Callable
from pathlib import Path

import click

__all__ = [
    "OptionEatAll",
    "natsorted",
    "input_position_dirpaths",
    "source_position_dirpaths",
    "target_position_dirpaths",
    "config_filepath",
    "config_filepaths",
    "output_dirpath",
    "output_filepath",
    "sbatch_filepath",
    "local",
    "cluster",
    "init_only",
    "monitor",
    "resume",
    "num_processes",
]

_NAT_SPLIT = re.compile(r"(\d+)")


def _natural_key(s) -> tuple:
    return tuple(
        int(tok) if tok.isdigit() else tok.lower()
        for tok in _NAT_SPLIT.split(str(s))
    )


def natsorted(values):
    """Natural-order sort: '2' before '10' (replaces the natsort dependency)."""
    return sorted(values, key=_natural_key)


class OptionEatAll(click.Option):
    """A click option that greedily consumes all following non-option args.

    Lets ``-i plate.zarr/*/*/*`` accept the shell-expanded list of positions
    as one option (reference: biahub/cli/option_eat_all.py:6-45).
    """

    def __init__(self, *args, **kwargs):
        self.save_other_options = kwargs.pop("save_other_options", True)
        nargs = kwargs.pop("nargs", -1)
        if nargs != -1:
            raise ValueError("OptionEatAll requires nargs=-1")
        super().__init__(*args, **kwargs)
        self._previous_parser_process = None
        self._eat_all_parser = None

    def add_to_parser(self, parser, ctx):
        def parser_process(value, state):
            done = False
            value = [value]
            if self.save_other_options:
                while state.rargs and not done:
                    for prefix in self._eat_all_parser.prefixes:
                        if state.rargs[0].startswith(prefix):
                            done = True
                    if not done:
                        value.append(state.rargs.pop(0))
            else:
                value += state.rargs
                state.rargs[:] = []
            self._previous_parser_process(tuple(value), state)

        retval = super().add_to_parser(parser, ctx)
        for name in self.opts:
            our_parser = parser._long_opt.get(name) or parser._short_opt.get(name)
            if our_parser:
                self._eat_all_parser = our_parser
                self._previous_parser_process = our_parser.process
                our_parser.process = parser_process
                break
        return retval


def _validate_and_process_paths(ctx, opt, value) -> list[Path]:
    from biahub_tpu.io.ngff import Plate, open_ome_zarr

    input_paths = [p for p in map(Path, natsorted(value)) if p.is_dir()]
    if not input_paths:
        raise click.BadParameter(f"No input positions found in {value}")
    dataset = open_ome_zarr(input_paths[0], mode="r")
    if isinstance(dataset, Plate):
        raise ValueError(
            "Please supply a single position instead of an HCS plate. Likely "
            "fix: replace 'input.zarr' with 'input.zarr/0/0/0'"
        )
    return input_paths


def _str_to_path(ctx, opt, value) -> Path:
    return Path(value)


def _validate_and_process_config_paths(ctx, opt, value) -> list[Path]:
    matched = []
    for pattern in value:
        expanded = glob.glob(pattern)
        if not expanded:
            raise click.BadParameter(f"No files matched pattern: {pattern}")
        matched.extend(expanded)
    validated = []
    for p in natsorted(map(Path, matched)):
        p = Path(p)
        if not p.exists():
            raise click.BadParameter(f"Path does not exist: {p}")
        if not p.is_file():
            raise click.BadParameter(f"Expected a file, not a directory: {p}")
        if p.suffix.lower() not in (".yml", ".yaml"):
            raise click.BadParameter(f"Expected a .yml file, got: {p}")
        validated.append(p)
    return validated


def _multi_path_option(names, help_text) -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            *names,
            required=True,
            cls=OptionEatAll,
            type=tuple,
            callback=_validate_and_process_paths,
            help=help_text,
        )(f)

    return decorator


def input_position_dirpaths() -> Callable:
    def decorator(f: Callable) -> Callable:
        return _multi_path_option(
            ("--input-position-dirpaths", "-i"),
            'Paths to input positions, for example: "input.zarr/0/0/0", '
            '"input.zarr/0/0/[0-9]", or "input.zarr/*/*/*"',
        )(f)

    return decorator


def source_position_dirpaths() -> Callable:
    def decorator(f: Callable) -> Callable:
        return _multi_path_option(
            ("--source-position-dirpaths", "-s"),
            'Paths to source positions, for example: "source.zarr/0/0/0" or '
            '"source.zarr/*/*/*"',
        )(f)

    return decorator


def target_position_dirpaths() -> Callable:
    def decorator(f: Callable) -> Callable:
        return _multi_path_option(
            ("--target-position-dirpaths", "-t"),
            'Paths to target positions, for example: "target.zarr/0/0/0" or '
            '"target.zarr/*/*/*"',
        )(f)

    return decorator


def config_filepath() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--config-filepath",
            "-c",
            required=True,
            type=click.Path(exists=True, file_okay=True, dir_okay=False),
            callback=_str_to_path,
            help="Path to YAML configuration file.",
        )(f)

    return decorator


def config_filepaths() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--config-filepaths",
            "-c",
            required=True,
            cls=OptionEatAll,
            type=tuple,
            callback=_validate_and_process_config_paths,
            help=(
                "Paths to YAML configuration files. "
                "All must be existing files with .yml extension."
            ),
        )(f)

    return decorator


def output_dirpath() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--output-dirpath",
            "-o",
            required=True,
            type=click.Path(exists=False, file_okay=False, dir_okay=True),
            callback=_str_to_path,
            help="Path to output directory",
        )(f)

    return decorator


def output_filepath() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--output-filepath",
            "-o",
            required=True,
            type=click.Path(exists=False, file_okay=True, dir_okay=False),
            callback=_str_to_path,
            help="Path to output file",
        )(f)

    return decorator


def sbatch_filepath() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--sbatch-filepath",
            "-sb",
            default=None,
            type=click.Path(exists=True, file_okay=True, dir_okay=False),
            help=(
                "Resource override file accepted for compatibility with the "
                "Slurm-era CLI; overrides are logged but execution is on-device."
            ),
        )(f)

    return decorator


def num_processes() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--num-processes",
            "-j",
            default=1,
            required=False,
            type=int,
            help=(
                "Number of parallel host I/O workers (the reference's "
                "process-pool size; compute itself is batched on device)."
            ),
        )(f)

    return decorator


def local() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--local",
            "-l",
            is_flag=True,
            default=False,
            help="Run jobs locally (compatibility flag; always local on TPU).",
        )(f)

    return decorator


def cluster() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--cluster",
            type=click.Choice(["slurm", "local", "debug"], case_sensitive=False),
            default="slurm",
            show_default=True,
            help=(
                "Execution mode: 'debug' runs batches synchronously in the "
                "foreground; 'local' (and 'slurm', kept for compatibility) run "
                "the pipelined on-device batch executor."
            ),
        )(f)

    return decorator


def init_only() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--init",
            "init_only",
            is_flag=True,
            default=False,
            help="Only initialize the output store and exit; skip per-position processing.",
        )(f)

    return decorator


def monitor() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--monitor",
            "-m",
            is_flag=True,
            default=False,
            help="Monitor progress of submitted jobs.",
        )(f)

    return decorator


def resume() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--resume/--no-resume",
            "resume",
            default=False,
            show_default=True,
            help=(
                "Skip the (time, channel) units this position already finished in "
                "an earlier attempt instead of recomputing the whole position. A "
                "changed config invalidates prior records automatically."
            ),
        )(f)

    return decorator


def num_processes() -> Callable:
    def decorator(f: Callable) -> Callable:
        return click.option(
            "--num-processes",
            "-j",
            default=1,
            help="Number of parallel processes",
            required=False,
            type=int,
        )(f)

    return decorator


def sbatch_filepath_preprocess() -> Callable:
    """Resource-override file for a preprocessing stage (reference:
    biahub/cli/parsing.py:170-181; compatibility — overrides are logged)."""

    def decorator(f: Callable) -> Callable:
        return click.option(
            "--sbatch-filepath-preprocess",
            "-sb-preprocess",
            default=None,
            type=click.Path(exists=True, file_okay=True, dir_okay=False),
            help="Resource override file for the preprocessing stage "
            "(Slurm-era compatibility; execution is on-device).",
        )(f)

    return decorator


def sbatch_filepath_predict() -> Callable:
    """Resource-override file for a prediction stage (reference:
    biahub/cli/parsing.py:184-195; compatibility — overrides are logged)."""

    def decorator(f: Callable) -> Callable:
        return click.option(
            "--sbatch-filepath-predict",
            "-sb-predict",
            default=None,
            type=click.Path(exists=True, file_okay=True, dir_okay=False),
            help="Resource override file for the prediction stage "
            "(Slurm-era compatibility; execution is on-device).",
        )(f)

    return decorator


def sbatch_to_submitit(filepath) -> dict:
    """Reference-name alias of the '#SBATCH/#LOCAL' override parser
    (reference: biahub/cli/parsing.py:198-249)."""
    from biahub_tpu.runtime.executor import sbatch_to_overrides

    return sbatch_to_overrides(filepath)
