import numpy as np
import pytest

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.dataset import GraphDataset, Loader
from sevennet_finetuning_tpu.data.elements import type_map_from_species
from sevennet_finetuning_tpu.data.neighborlist import neighbor_list
from sevennet_finetuning_tpu.data.vasp import (
    Structure,
    brace_expand,
    read_outcar,
    read_structure_list,
)
from sevennet_finetuning_tpu.model.graph import collate, structure_to_graph

REF_OUTCAR = '/root/reference/example_inputs/data/label_1/OUTCAR_1'
REF_SLIST = '/root/reference/example_inputs/training/structure_list'


def _random_structure(n=20, seed=0, cell_size=6.0):
    rng = np.random.default_rng(seed)
    return Structure(
        species=['Si'] * n,
        pos=rng.uniform(0, cell_size, (n, 3)),
        cell=np.eye(3) * cell_size,
        energy=-5.0 * n,
        forces=rng.normal(size=(n, 3)),
        stress=rng.normal(size=6) * 0.01,
    )


def test_neighbor_list_symmetric_and_within_cutoff():
    s = _random_structure()
    i, j, S, D = neighbor_list(s.pos, s.cell, True, 3.0)
    r = np.linalg.norm(D, axis=1)
    assert (r < 3.0).all() and (r > 0).all()
    fwd = set(map(tuple, np.c_[i, j, S.astype(int)]))
    rev = set(map(tuple, np.c_[j, i, (-S).astype(int)]))
    assert fwd == rev


def test_neighbor_list_matches_brute_force():
    s = _random_structure(n=12, seed=3, cell_size=5.0)
    i, j, S, D = neighbor_list(s.pos, s.cell, True, 2.6)
    # brute force over 5^3 images
    count = 0
    for a in range(12):
        for b in range(12):
            for sx in range(-2, 3):
                for sy in range(-2, 3):
                    for sz in range(-2, 3):
                        if a == b and sx == sy == sz == 0:
                            continue
                        v = s.pos[b] + np.array([sx, sy, sz]) @ s.cell \
                            - s.pos[a]
                        if np.linalg.norm(v) < 2.6:
                            count += 1
    assert len(i) == count


def test_neighbor_list_unwrapped_positions():
    s = _random_structure(n=10, seed=4, cell_size=5.0)
    i1, j1, S1, D1 = neighbor_list(s.pos, s.cell, True, 2.5)
    # translate some atoms by whole lattice vectors: same graph
    pos2 = s.pos.copy()
    pos2[::2] += np.array([1.0, -2.0, 3.0]) @ s.cell
    i2, j2, S2, D2 = neighbor_list(pos2, s.cell, True, 2.5)
    assert len(i1) == len(i2)
    # distances multiset identical
    r1 = np.sort(np.linalg.norm(D1, axis=1))
    r2 = np.sort(np.linalg.norm(D2, axis=1))
    np.testing.assert_allclose(r1, r2, atol=1e-10)
    # shift consistency: pos[j] + S.cell - pos[i] reproduces D
    np.testing.assert_allclose(
        pos2[j2] + S2 @ s.cell - pos2[i2], D2, atol=1e-10
    )


def test_neighbor_list_nonperiodic():
    s = _random_structure(n=10, seed=5)
    i, j, S, D = neighbor_list(s.pos, s.cell, False, 3.0)
    assert (S == 0).all()


def test_outcar_reader():
    structs = read_outcar(REF_OUTCAR)
    assert len(structs) == 1
    s = structs[0]
    assert len(s) == 96
    assert set(s.species) == {'Hf', 'O'}
    assert s.species.count('Hf') == 32
    np.testing.assert_allclose(s.energy, -2759.11555469)
    assert s.forces.shape == (96, 3)
    assert s.stress is not None and s.stress.shape == (6,)


def test_structure_list_reader():
    d = read_structure_list(REF_SLIST)
    # the example lists each file twice per label
    assert sorted(d.keys()) == ['label_1', 'label_2']
    assert len(d['label_1']) == 10


def test_brace_expand():
    assert brace_expand('a{1..3}b') == ['a1b', 'a2b', 'a3b']
    assert brace_expand('x{p,q}') == ['xp', 'xq']
    assert brace_expand('plain') == ['plain']


def test_collate_padding_and_masks():
    tm = {14: 0}
    gs = [
        structure_to_graph(_random_structure(n, seed=n), 3.0, tm)
        for n in (8, 12)
    ]
    b = collate(gs, n_node=32, n_edge=512, n_graph=3)
    assert b[K.POS].shape == (32, 3)
    assert b[K.NODE_MASK].sum() == 20
    assert b[K.EDGE_MASK].sum() == sum(g[K.EDGE_IDX].shape[1] for g in gs)
    # second graph's edges reference offset nodes
    e1 = gs[0][K.EDGE_IDX].shape[1]
    assert b[K.EDGE_IDX][:, e1:e1 + 1].min() >= 8
    assert b[K.NUM_ATOMS].tolist() == [8, 12, 0]
    assert np.isnan(b[K.ENERGY][2])
    # overflow raises
    with pytest.raises(ValueError):
        collate(gs, n_node=10, n_edge=512, n_graph=3)


def test_dataset_statistics():
    tm = type_map_from_species({'Hf', 'O'})
    structs = read_outcar(REF_OUTCAR)
    ds = GraphDataset.from_structures(structs * 3, 4.0, tm)
    m = ds.per_atom_energy_mean()
    np.testing.assert_allclose(m, -2759.11555469 / 96, rtol=1e-6)
    assert 0 < ds.force_rms() < 10
    assert 20 < ds.avg_num_neigh() < 25
    ref_e = ds.species_ref_energies(2)
    # composition 32 Hf + 64 O must reproduce total energy
    np.testing.assert_allclose(
        32 * ref_e[tm[72]] + 64 * ref_e[tm[8]], -2759.11555469, rtol=1e-3
    )


def test_loader_shapes_static():
    tm = {14: 0}
    gs = [
        structure_to_graph(_random_structure(n, seed=n), 3.0, tm)
        for n in (8, 12, 10, 9, 11)
    ]
    loader = Loader(GraphDataset(gs), batch_size=2, shuffle=True, seed=1)
    shapes = set()
    for batch in loader:
        shapes.add(batch[K.POS].shape + batch[K.EDGE_IDX].shape)
    assert len(shapes) == 1  # every batch identical static shape
    assert len(loader) == 3


def test_native_neighbor_list_matches_python():
    from sevennet_finetuning_tpu.data.native import (
        native_available,
        neighbor_list_native,
    )

    if not native_available():
        pytest.skip('no C++ toolchain')
    import os

    rng = np.random.default_rng(7)
    for n, a, cut in [(96, 10.4, 4.0), (64, 5.0, 6.0)]:
        pos = rng.uniform(-3, a + 3, (n, 3))   # unwrapped on purpose
        cell = np.eye(3) * a + rng.normal(scale=0.3, size=(3, 3))
        os.environ['SEVENN_NO_NATIVE'] = '1'
        try:
            i1, j1, s1, _ = neighbor_list(pos, cell, True, cut)
        finally:
            del os.environ['SEVENN_NO_NATIVE']
        i2, j2, s2, d2 = neighbor_list_native(pos, cell, True, cut)
        set1 = set(map(tuple, np.c_[i1, j1, s1.astype(int)]))
        set2 = set(map(tuple, np.c_[i2, j2, s2.astype(int)]))
        assert set1 == set2
        np.testing.assert_allclose(
            pos[j2] + s2 @ cell - pos[i2], d2, atol=1e-10
        )


def test_balanced_packing_shrinks_capacity():
    """cache=True packs batches to equalize edge totals: every graph
    appears exactly once and the static capacity drops from the
    'batch_size largest graphs together' bound toward the mean."""
    import numpy as np

    from sevennet_finetuning_tpu import keys as K
    from sevennet_finetuning_tpu.data.dataset import GraphDataset, Loader
    from sevennet_finetuning_tpu.data.elements import z_to_symbol
    from sevennet_finetuning_tpu.data.vasp import Structure
    from sevennet_finetuning_tpu.model.graph import structure_to_graph

    rng = np.random.default_rng(0)
    structs = []
    for i in range(24):
        n = 4 if i % 2 else 16      # strongly mixed sizes
        a = 6.0 if i % 2 else 7.5
        structs.append(Structure(
            species=[z_to_symbol(8)] * n,
            pos=rng.uniform(0, a, (n, 3)),
            cell=np.eye(3) * a,
            energy=-1.0 * n,
            forces=rng.normal(size=(n, 3)),
        ))
    ds = GraphDataset.from_structures(structs, 4.0, {8: 0})

    plain = Loader(ds, 4)
    packed = Loader(ds, 4, cache=True, shuffle=True, seed=0)
    assert packed.n_edge < plain.n_edge

    batches = packed.materialize()
    assert len(batches) == 6
    # every graph used exactly once: total real nodes match
    n_nodes = sum(int(b[K.NODE_MASK].sum()) for b in batches)
    assert n_nodes == sum(len(s) for s in structs)
    # every batch fits the packed capacity
    for b in batches:
        assert int(b[K.EDGE_MASK].sum()) <= packed.n_edge
    # epoch_order is a permutation of the batches
    order = packed.epoch_order()
    assert sorted(order.tolist()) == list(range(6))
    # frozen membership -> EXACT capacity: the packed edge max rounded
    # to the kernel edge-tile quantum (256), no headroom margin (r5)
    packed_edge_max = max(int(b[K.EDGE_MASK].sum()) for b in batches)
    assert packed.n_edge == -(-packed_edge_max // 256) * 256
    packed_node_max = max(int(b[K.NODE_MASK].sum()) for b in batches)
    assert packed.n_node == -(-packed_node_max // 64) * 64
