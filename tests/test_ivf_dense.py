"""Dense block packing (IvfConfig.dense): cells bin-packed into ~full
physical blocks, probed through the cell_block indirection.

Contract under test (models/ivf.py _dense_remap + ivf_search_impl):
- recall parity with the per-cell layout at equal nprobe (a gathered
  block contains at least the probed cell's rows),
- no duplicate ids in results (shared blocks + replicas dedup at top-k),
- nblocks < nprobe compacts the gather list to unique blocks and keeps
  recall above the nblocks-cells floor,
- appends, deletes and visibility masks keep working in block coords.
"""

import numpy as np
import pytest

from turdb_tpu.models.ivf import IvfIndex


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    cents = rng.standard_normal((60, 32)).astype(np.float32) * 5
    x = (cents[rng.integers(0, 60, 20000)]
         + rng.standard_normal((20000, 32))).astype(np.float32)
    q = (cents[rng.integers(0, 60, 200)]
         + rng.standard_normal((200, 32))).astype(np.float32)
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d, axis=1)[:, :10]
    return x, q, truth


def _recall(ids, truth):
    return np.mean([len(set(p[p >= 0]) & set(t)) / 10
                    for p, t in zip(ids, truth)])


def test_dense_recall_parity_and_dedup(data):
    x, q, truth = data
    base = IvfIndex(dim=32)
    base.add(x)
    if base.state is None:
        base.train()
    _, ib = base.search(q, 10, nprobe=8)

    dn = IvfIndex(dim=32, dense_pack=True, replicate=False)
    dn.add(x)
    if dn.state is None:
        dn.train()
    assert dn.cfg.dense and dn.state.cell_block is not None
    # without replicas pre-filling lanes, packing must compact the store
    assert dn.state.members.shape[0] < dn.cfg.n_clusters
    _, idn = dn.search(q, 10, nprobe=8)
    assert _recall(idn, truth) >= _recall(ib, truth) - 0.02
    for row in idn:
        v = row[row >= 0]
        assert len(set(v.tolist())) == len(v)


def test_dense_nblocks_compaction(data):
    x, q, truth = data
    dn = IvfIndex(dim=32, dense_pack=True, replicate=False, nblocks=4)
    dn.add(x)
    if dn.state is None:
        dn.train()
    _, ids = dn.search(q, 10, nprobe=12)
    # 4 unique blocks out of 12 probed cells: locality packing keeps
    # most of the 12-cell recall
    assert _recall(ids, truth) >= 0.90


def test_dense_append_delete_allowed(data):
    x, q, truth = data
    rng = np.random.default_rng(1)
    dn = IvfIndex(dim=32, dense_pack=True)
    dn.add(x)
    if dn.state is None:
        dn.train()
    extra = x[:500] + 0.01 * rng.standard_normal((500, 32)).astype(np.float32)
    slots = dn.add(extra)
    _, ie = dn.search(extra[:50], 1, nprobe=8)
    assert np.mean(ie[:, 0] == slots[:50]) >= 0.9
    dn.delete(slots[:100])
    allowed = np.ones(dn.size, bool)
    allowed[slots[100:200]] = False
    _, ia = dn.search(extra[100:150], 5, nprobe=8, allowed=allowed)
    assert not np.isin(ia, slots[:200]).any()


def test_fast_build_profile(data):
    x, q, truth = data
    fb = IvfIndex(dim=32, fast_build=True)
    fb.add(x)
    if fb.state is None:
        fb.train()
    _, ids = fb.search(q, 10, nprobe=8)
    assert _recall(ids, truth) >= 0.90
