"""ECS registry/taskgraph unit tests."""

import numpy as np
import pytest

from madrona_renderer_tpu.ecs import (
    VALID,
    ECSRegistry,
    TaskGraphManager,
    component,
)
from madrona_renderer_tpu.core.sim import ExportID, register_types


def _registry():
    reg = ECSRegistry()
    reg.register_archetype(
        "thing",
        [component("position", (3,)), component("hp", (), np.int32, default=5)],
        capacity=4,
    )
    reg.register_singleton(component("time"))
    reg.export_column(0, "thing", "position")
    return reg


def test_spawn_and_columns():
    tables = _registry().build_tables(num_worlds=2)
    s0 = tables.spawn("thing", 0, position=[1, 2, 3])
    s1 = tables.spawn("thing", 0, position=[4, 5, 6], hp=9)
    assert (s0, s1) == (0, 1)
    col = tables.column("thing", "position")
    np.testing.assert_array_equal(col[0, 0], [1, 2, 3])
    np.testing.assert_array_equal(col[0, 1], [4, 5, 6])
    assert tables.column("thing", "hp")[0, 1] == 9
    assert tables.column("thing", "hp")[0, 0] == 5  # default
    valid = tables.column("thing", VALID)
    np.testing.assert_array_equal(valid[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(valid[1], [0, 0, 0, 0])


def test_capacity_enforced():
    tables = _registry().build_tables(1)
    for _ in range(4):
        tables.spawn("thing", 0, position=[0, 0, 0])
    with pytest.raises(IndexError):
        tables.spawn("thing", 0, position=[0, 0, 0])


def test_destroy_flips_mask():
    tables = _registry().build_tables(1)
    s = tables.spawn("thing", 0, position=[0, 0, 0])
    tables.destroy("thing", 0, s)
    assert tables.column("thing", VALID)[0, s] == 0.0


def test_export_slot_lookup():
    tables = _registry().build_tables(1)
    tables.spawn("thing", 0, position=[7, 8, 9])
    np.testing.assert_array_equal(tables.exported(0)[0, 0], [7, 8, 9])


def test_bad_component_or_archetype():
    reg = _registry()
    with pytest.raises(KeyError):
        reg.export_column(1, "thing", "nope")
    with pytest.raises(KeyError):
        reg.export_column(1, "nothing", "position")
    tables = reg.build_tables(1)
    with pytest.raises(KeyError):
        tables.spawn("thing", 0, nope=1)


def test_device_tables_pytree():
    tables = _registry().build_tables(2)
    tables.spawn("thing", 1, position=[1, 1, 1])
    arch, singles = tables.device_tables()
    assert arch["thing"]["position"].shape == (2, 4, 3)
    assert float(singles["time"][0]) == 0.0


def test_taskgraph_ordering_and_deps():
    tg = TaskGraphManager()
    b = tg.init("step")
    log = []

    def a(state):
        log.append("a")
        return state + 1

    def c(state):
        log.append("c")
        return state * 2

    na = b.add_to_graph(a)
    b.add_to_graph(c, deps=(na,))
    fn = b.build()
    assert fn(3) == 8  # (3+1)*2
    assert log == ["a", "c"]


def test_taskgraph_bad_dep_rejected():
    from madrona_renderer_tpu.ecs.taskgraph import NodeID

    tg = TaskGraphManager()
    b = tg.init("g")
    with pytest.raises(ValueError):
        b.add_to_graph(lambda s: s, deps=(NodeID("g", 5),))
    with pytest.raises(ValueError):
        tg.init("g")  # duplicate


def test_build_sequence_runs_graphs_in_init_order():
    tg = TaskGraphManager()
    tg.init("one").add_to_graph(lambda s: s + ["one"])
    tg.init("two").add_to_graph(lambda s: s + ["two"])
    assert tg.build_sequence()([]) == ["one", "two"]


def test_sim_register_types_matches_reference_slots():
    reg = register_types(4, 2)
    assert reg.exports[ExportID.InstancePosition] == ("renderable", "position")
    assert reg.exports[ExportID.CameraRotation] == ("agent", "rotation")
    assert ExportID.NumExports == 8  # slot numbering parity (src/sim.hpp:19-29)
