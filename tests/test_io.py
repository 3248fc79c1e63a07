"""Data I/O + checkpoint/warm-start tests (reference: io.rs:519-662,
tests.rs:84-86)."""

import os
import re

import numpy as np
import pytest

from orc_tpu.io.data import read_data, rust_sci, write_data, write_gradients
from orc_tpu.io.checkpoint import (
    load_checkpoint,
    load_or_initialize,
    save_checkpoint,
)
from orc_tpu.mesh import structured_box_mesh
from orc_tpu.mesh.zones import FaceCondition
from orc_tpu.solver.simple import initial_state


def test_rust_sci_format():
    assert rust_sci(0.000156, 2) == "1.56e-4"
    assert rust_sci(-1500.0, 2) == "-1.50e3"
    assert rust_sci(0.0, 2) == "0.00e0"
    assert rust_sci(1.0, 0) == "1e0"


def test_plotter_regex_compatibility(tmp_path):
    """The reference plotter's regex (plot_output.py:139-141) must match
    every line we write."""
    mesh, _ = structured_box_mesh(2, 2, 1)
    rng = np.random.default_rng(0)
    vel = rng.standard_normal((mesh.n_cells, 3)) * 1e-3
    p = rng.standard_normal(mesh.n_cells) * 100
    path = tmp_path / "out.csv"
    write_data(path, mesh, vel, p)
    FLOAT = "[\\d|\\.|e|\\-]+"
    VECTOR = f"\\(({FLOAT}),\\s+({FLOAT}),\\s+({FLOAT})\\)"
    pattern = re.compile(f"{VECTOR}\\t{VECTOR}\\t({FLOAT})")
    for line in open(path):
        assert pattern.match(line), f"plotter regex rejects: {line!r}"


def test_data_roundtrip(tmp_path):
    mesh, _ = structured_box_mesh(3, 2, 2)
    rng = np.random.default_rng(1)
    vel = rng.standard_normal((mesh.n_cells, 3))
    p = rng.standard_normal(mesh.n_cells)
    path = tmp_path / "data.csv"
    write_data(path, mesh, vel, p, precision=12)
    vel2, p2 = read_data(path)
    np.testing.assert_allclose(vel2, vel, rtol=1e-11)
    np.testing.assert_allclose(p2, p, rtol=1e-11)


def test_gradients_file(tmp_path):
    mesh, _ = structured_box_mesh(2, 2, 1)
    C = mesh.n_cells
    gv = np.arange(C * 9, dtype=float).reshape(C, 3, 3)
    gp = np.arange(C * 3, dtype=float).reshape(C, 3)
    path = tmp_path / "grads.csv"
    write_gradients(path, mesh, gv, gp)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == C
    # Parse the way the reference plotter does (plot_output.py:155-163).
    _, vel_grad, p_grad = [
        s.split(", ")
        for s in lines[1].replace("(", "").replace(")", "").split("\t")
    ]
    assert len(vel_grad) == 9 and len(p_grad) == 3
    np.testing.assert_allclose(
        np.array(vel_grad, dtype=float).reshape(3, 3), gv[1]
    )


def test_checkpoint_roundtrip(tmp_path):
    mesh, _ = structured_box_mesh(3, 3, 1)
    state = initial_state(mesh)
    state = state.__class__(
        vel=state.vel + 1.5, p=state.p - 2.0, mom_diag=state.mom_diag * 3.0
    )
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, mesh, state, iteration=42)
    state2, it = load_checkpoint(path, mesh)
    assert it == 42
    np.testing.assert_allclose(np.asarray(state2.vel), np.asarray(state.vel))
    np.testing.assert_allclose(np.asarray(state2.p), np.asarray(state.p))
    # Wrong mesh -> refused.
    other, _ = structured_box_mesh(3, 3, 2)
    with pytest.raises(ValueError, match="different mesh"):
        load_checkpoint(path, other)


def test_warm_start_semantics(tmp_path):
    """load_or_initialize: existing file -> resume; missing -> fresh
    init (tests.rs:84-86)."""
    mesh, table = structured_box_mesh(3, 3, 1)
    table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=1.0)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    missing = str(tmp_path / "absent.npz")
    st = load_or_initialize(missing, mesh, table, mu=0.001, rho=1000.0)
    assert st.vel.shape == (mesh.n_cells, 3)

    # Text-format warm start.
    data = tmp_path / "warm.csv"
    vel = np.full((mesh.n_cells, 3), 0.25)
    p = np.full(mesh.n_cells, 7.0)
    write_data(data, mesh, vel, p, precision=10)
    st2 = load_or_initialize(str(data), mesh, table, mu=0.001, rho=1000.0)
    np.testing.assert_allclose(np.asarray(st2.vel), 0.25, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(st2.p), 7.0, rtol=1e-9)
