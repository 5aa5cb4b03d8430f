"""CLI wiring smoke tests: every entry point parses --help."""

import pytest

from sept_tpu.cli import (
    evaluate,
    featurize,
    preprocess,
    run_all,
    train_baseline,
    train_cloak,
)


@pytest.mark.parametrize(
    "mod", [featurize, preprocess, train_baseline, train_cloak, evaluate, run_all]
)
def test_help_exits_zero(mod, capsys):
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "--dataset" in out
