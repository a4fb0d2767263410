"""S2Cell parity tests ported from S2Geometry.Tests/S2CellTest.cs
(testFaces, testSubdivide invariants — condensed random descent)."""

import math

import numpy as np
import pytest

from s2spark.kernel import cellid as ci
from s2spark.kernel.cell import Cell


def _norm(p):
    n = math.sqrt(sum(v * v for v in p))
    return tuple(v / n for v in p)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def test_faces():
    """S2CellTest.cs:361-413: face cells, edge/vertex multiplicity,
    orthogonality of vertices and edge normals."""
    edge_counts: dict = {}
    vertex_counts: dict = {}
    for face in range(6):
        cid = int(ci.from_face_pos_level(
            np.array([face]), np.array([0], dtype=np.uint64), np.array([0]))[0])
        cell = Cell(cid)
        assert cell.id == cid
        assert cell.face == face
        assert cell.level == 0
        assert cell.orientation == (face & 1)  # SwapMask
        assert not cell.is_leaf
        for k in range(4):
            e = cell.get_edge_raw(k)
            v = cell.get_vertex_raw(k)
            edge_counts[e] = edge_counts.get(e, 0) + 1
            vertex_counts[v] = vertex_counts.get(v, 0) + 1
            assert abs(_dot(v, e)) < 1e-14
            assert abs(_dot(cell.get_vertex_raw((k + 1) & 3), e)) < 1e-14
            n = _norm(_cross(v, cell.get_vertex_raw((k + 1) & 3)))
            assert abs(_dot(n, cell.get_edge(k)) - 1.0) < 1e-14
    assert all(c == 2 for c in edge_counts.values())
    assert all(c == 3 for c in vertex_counts.values())


def _check_subdivide(cell: Cell, rng, max_level: int):
    """S2CellTest.cs:127-288 invariants for one cell's children."""
    if cell.is_leaf or cell.level >= max_level:
        return
    children_ids = ci.children(np.array([cell.id], dtype=np.uint64)).reshape(-1)
    exact = approx = average = 0.0
    children = [Cell(int(c)) for c in children_ids]
    parent_cap = cell.cap_bound()
    parent_rect = cell.rect_bound()
    if cell.contains_point(0, 0, 1) or cell.contains_point(0, 0, -1):
        assert parent_rect.lng.is_full
    for i, child in enumerate(children):
        exact += child.exact_area()
        approx += child.approx_area()
        average += child.average_area()

        # geometry consistent with the id; containment matrix
        assert cell.contains_cell(child)
        assert cell.may_intersect_cell(child)
        assert not child.contains_cell(cell)
        assert cell.contains_point(*child.get_center())
        for j, other in enumerate(children):
            if j != i:
                assert not child.contains_point(*other.get_center())
                assert not child.may_intersect_cell(other)

        # cap/rect bounds contain the child's center and vertices
        child_cap = child.cap_bound()
        child_rect = child.rect_bound()
        cx, cy, cz = child.get_center()
        assert child_cap.contains_point(cx, cy, cz)
        lat = math.atan2(cz, math.hypot(cx, cy))
        lng = math.atan2(cy, cx)
        assert child_rect.contains_latlng(lat, lng)
        assert parent_cap.contains_point(cx, cy, cz)
        assert parent_rect.contains_latlng(lat, lng)
        for j in range(4):
            vx, vy, vz = child.get_vertex(j)
            vlat = math.atan2(vz, math.hypot(vx, vy))
            vlng = math.atan2(vy, vx)
            assert child_cap.contains_point(vx, vy, vz)
            assert child_rect.contains_latlng(vlat, vlng)
            assert parent_cap.contains_point(vx, vy, vz)
            assert parent_rect.contains_latlng(vlat, vlng)

        # bound tightness: exclude >= 2 vertices of each adjacent sibling
        for j, other in enumerate(children):
            if j == i:
                continue
            cap_count = sum(
                1 for k in range(4)
                if child_cap.contains_point(*other.get_vertex(k)))
            assert cap_count <= 2

        if rng.integers(0, 3) == 0:
            _check_subdivide(child, rng, max_level)

    # child area sums vs parent (S2CellTest.cs:270-288 tolerances)
    assert abs(math.log(exact / cell.exact_area())) <= abs(math.log(1 + 1e-6))
    assert abs(math.log(approx / cell.approx_area())) <= abs(math.log(1.03))
    assert abs(math.log(average / cell.average_area())) <= abs(math.log(1 + 1e-15))


@pytest.mark.parametrize("face", range(6))
def test_subdivide(face):
    rng = np.random.default_rng(1000 + face)
    root = Cell(int(ci.from_face_pos_level(
        np.array([face]), np.array([0], dtype=np.uint64), np.array([0]))[0]))
    _check_subdivide(root, rng, max_level=5)
