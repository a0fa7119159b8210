"""Benchmark-driver harness parity (ongrav3d.cpp:465-912 behaviors).

Covers the driver-level contracts the C++ mains enforce: flag parsing,
stage toggles, just_build_trees, the galaxy initial condition, and the
overflow -> wider-lists retry (the driver must never report errors
computed from a truncated interaction list).
"""

import io
import contextlib

import numpy as np
import pytest

from onbody_tpu.drivers import common


def _run(argv, kernel="grav3d", toggles=(1, 0, 0, 1, 1)):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        common.run_driver(kernel, "test_driver", argv,
                          test_iterations=toggles)
    return buf.getvalue()


def test_driver_end_to_end_report():
    out = _run(["-n=2000", "-b=64", "-o=4"])
    assert "error in treecode3" in out
    assert "error in fast" in out
    # rms errors parse and sit inside the order-4 envelope
    for line in out.splitlines():
        if line.startswith("error in"):
            rms = float(line.split("/")[-1])
            assert rms < 3e-3, line


def test_driver_stage_toggle_flag():
    """-test= selects stages exactly (test_iterations fixture)."""
    out = _run(["-n=1000", "-b=64", "-test=1,0,0,1,0"])
    assert "treecode3" in out
    assert "fast" not in out
    assert "treecode2" not in out


def test_driver_just_build_trees():
    out = _run(["-n=1000", "-b=64", "-justtrees"])
    assert "Done (just_build_trees)" in out
    assert "error in" not in out


def test_driver_galaxy_flag():
    """-g: random_in_disk sources (ongrav3d.cpp:579-583) run end-to-end.
    The disk is strongly non-uniform — exercises deep/uneven trees."""
    out = _run(["-n=2000", "-b=64", "-o=4", "-g",
                "-test=1,0,0,1,0"])
    for line in out.splitlines():
        if line.startswith("error in"):
            rms = float(line.split("/")[-1])
            assert rms < 1e-2, line


def test_driver_overflow_retries_wider():
    """Forced-tiny list capacity overflows; the driver must recover with
    the 4x-wider retry and report errors from a COMPLETE sum."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        common.run_driver("grav3d", "test_driver",
                          ["-n=4000", "-b=64", "-o=4", "-t=1.4",
                           "-test=1,0,0,0,1"],
                          cfg_overrides=dict(cap_groups_dtt=2))
    out = buf.getvalue()
    assert "retrying with 4x widths" in out
    for line in out.splitlines():
        if line.startswith("error in fast"):
            rms = float(line.split("/")[-1])
            assert rms < 3e-3, line
            break
    else:
        raise AssertionError("no 'error in fast' line:\n" + out)
