"""BVH build + wide-tree flattening invariants."""

import numpy as np
import pytest

from cuda_raytracer_tpu.accel import BVHAccel, build_flat_wide_bvh


def random_boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.random((n, 3)) * 10
    e = rng.random((n, 3)) * 0.1
    return c - e, c + e


def test_leaves_partition_primitives():
    pmin, pmax = random_boxes(5000)
    bvh = BVHAccel(pmin, pmax)
    leaves = sorted(bvh.leaf_ranges())
    covered = []
    for s, r in leaves:
        assert r <= 32
        covered.extend(range(s, s + r))
    assert covered == list(range(5000))
    assert sorted(bvh.get_sorted_order().tolist()) == list(range(5000))


def test_node_bboxes_contain_children():
    pmin, pmax = random_boxes(2000, seed=3)
    bvh = BVHAccel(pmin, pmax)

    def check(node):
        if node.is_leaf:
            ids = bvh.get_sorted_order()[node.start : node.start + node.range]
            assert np.all(pmin[ids] >= node.bb_min - 1e-9)
            assert np.all(pmax[ids] <= node.bb_max + 1e-9)
        else:
            for c in (node.l, node.r):
                assert np.all(c.bb_min >= node.bb_min - 1e-9)
                assert np.all(c.bb_max <= node.bb_max + 1e-9)
                check(c)

    check(bvh.root)


def test_build_deterministic():
    pmin, pmax = random_boxes(1000, seed=7)
    a = BVHAccel(pmin, pmax)
    b = BVHAccel(pmin, pmax)
    assert np.array_equal(a.get_sorted_order(), b.get_sorted_order())


@pytest.mark.parametrize("width", [2, 4, 8, 16])
def test_wide_flatten_consistency(width):
    pmin, pmax = random_boxes(3000, seed=1)
    bvh = BVHAccel(pmin, pmax)
    flat = build_flat_wide_bvh(bvh, width)
    n = flat.num_nodes
    # level lists cover every node exactly once
    all_ids = np.concatenate(flat.levels)
    assert sorted(all_ids.tolist()) == list(range(n))
    # outlets reference valid nodes; leaf nodes have no outlets
    for i in range(n):
        is_leaf = flat.leaf_range[i] > 0
        outs = flat.outlets[i]
        if is_leaf:
            assert np.all(outs == -1)
        else:
            valid = outs[outs >= 0]
            assert len(valid) > 0
            assert np.all(valid < n)
    # every non-root node is referenced exactly once
    refs = flat.outlets[flat.outlets >= 0]
    assert sorted(refs.tolist()) == list(range(1, n))
    # leaf ranges cover all primitives exactly once
    covered = []
    for i in range(n):
        if flat.leaf_range[i] > 0:
            covered.extend(
                range(flat.leaf_start[i], flat.leaf_start[i] + flat.leaf_range[i])
            )
    assert sorted(covered) == list(range(3000))


def test_child_boxes_match_subtree_extent():
    pmin, pmax = random_boxes(500, seed=2)
    bvh = BVHAccel(pmin, pmax)
    flat = build_flat_wide_bvh(bvh, 4)
    order = bvh.get_sorted_order()

    def leaf_prims(node_idx):
        out = []
        if flat.leaf_range[node_idx] > 0:
            s, r = flat.leaf_start[node_idx], flat.leaf_range[node_idx]
            out.extend(order[s : s + r])
        else:
            for c in flat.outlets[node_idx]:
                if c >= 0:
                    out.extend(leaf_prims(c))
        return out

    # each child AABB must contain all primitives beneath that child
    for i in range(flat.num_nodes):
        for k, c in enumerate(flat.outlets[i]):
            if c < 0:
                continue
            ids = leaf_prims(c)
            assert np.all(pmin[ids] >= flat.child_min[i, k] - 1e-5)
            assert np.all(pmax[ids] <= flat.child_max[i, k] + 1e-5)


def test_native_builder_matches_numpy():
    """The C++ builder must produce a bit-identical tree to numpy."""
    import pytest

    from cuda_raytracer_tpu.native import load_library

    if load_library() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    n = 3000
    c = rng.random((n, 3)) * 10
    h = rng.random((n, 3)) * 0.3
    a = BVHAccel(c - h, c + h, max_leaf_size=4, backend="native")
    b = BVHAccel(c - h, c + h, max_leaf_size=4, backend="numpy")
    assert a.backend_used == "native"
    np.testing.assert_array_equal(a.sorted_order, b.sorted_order)

    def walk(x, y):
        np.testing.assert_allclose(x.bb_min, y.bb_min)
        np.testing.assert_allclose(x.bb_max, y.bb_max)
        assert (x.start, x.range, x.is_leaf) == (y.start, y.range, y.is_leaf)
        if not x.is_leaf:
            walk(x.l, y.l)
            walk(x.r, y.r)

    import sys

    sys.setrecursionlimit(50000)
    walk(a.root, b.root)


def test_native_builder_empty_and_single():
    from cuda_raytracer_tpu.native import load_library

    if load_library() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    one = np.array([[0.0, 0.0, 0.0]])
    t = BVHAccel(one, one + 1, backend="native")
    assert t.root.is_leaf and t.root.range == 1
