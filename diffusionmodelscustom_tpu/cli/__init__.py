"""Command-line entry points: train / generate / evaluate / imagen."""

__all__ = ["train", "generate", "evaluate", "imagen_cli"]
