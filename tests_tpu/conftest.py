"""On-hardware smoke lane: runs on the REAL TPU chip (default backend).

Deliberately a separate directory from tests/ — that conftest forces the
8-device virtual CPU backend before jax initializes, which cannot be undone
in-process.  Run with:

    python -m pytest tests_tpu/ -q        # needs the real chip

CI (tests/) never touches hardware; this lane catches Mosaic/XLA
regressions that interpret-mode tests cannot (the verify skill documents it
as the one-command hardware check).
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="no TPU backend (tests_tpu needs the real chip)")
        for item in items:
            item.add_marker(skip)
