"""The examples/ scripts are user-facing documentation — run them.

Each executes end-to-end on the CPU mesh with small arguments; breakage
here means the README's entry points rot silently.
"""

import runpy
import sys

import pytest

EXAMPLES = [
    ("examples/round_trip.py", []),
    ("examples/multichannel.py", []),
    ("examples/long_damped.py", ["--seconds", "2"]),
]


@pytest.mark.parametrize("path,args", EXAMPLES,
                         ids=[p.split("/")[-1] for p, _ in EXAMPLES])
def test_example_runs(path, args, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [path] + args)
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "SNR" in out or "ratio" in out