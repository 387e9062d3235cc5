"""``python -m voice100_tpu`` — the unified training CLI
(equivalent of the reference's ``voice100`` console script,
voice100/main.py:8-17)."""

from .training.cli import cli_main

if __name__ == "__main__":
    cli_main()
