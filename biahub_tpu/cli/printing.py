"""Console output helpers (reference: biahub/cli/printing.py)."""

import click


def echo_headline(headline: str) -> None:
    click.echo(click.style(headline, fg="green"))


def echo_settings(settings) -> None:
    for key, value in settings.model_dump().items():
        click.echo(f"  {key}: {value}")
