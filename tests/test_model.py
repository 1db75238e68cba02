import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_finetuning_tpu import keys as K
from sevennet_finetuning_tpu.data.elements import type_map_from_species
from sevennet_finetuning_tpu.data.vasp import Structure, read_outcar
from sevennet_finetuning_tpu.model.build import build_model_spec
from sevennet_finetuning_tpu.model.graph import collate, structure_to_graph
from sevennet_finetuning_tpu.model.nequip import (
    apply_model,
    init_params,
    trainable_mask,
)

REF_OUTCAR = '/root/reference/example_inputs/data/label_1/OUTCAR_1'


def small_config(tm, **over):
    cfg = {
        K.NUM_SPECIES: len(tm),
        K.TYPE_MAP: tm,
        K.NODE_FEATURE_MULTIPLICITY: 4,
        K.LMAX: 1,
        K.NUM_CONVOLUTION: 2,
        K.CUTOFF: 4.0,
        K.IS_PARITY: True,
        K.CONV_DENOMINATOR: 20.0,
        K.SHIFT: -2.0,
        K.SCALE: 1.5,
    }
    cfg.update(over)
    return cfg


@pytest.fixture(scope='module')
def hf_o_batch():
    s = read_outcar(REF_OUTCAR)[0]
    tm = type_map_from_species(set(s.species))
    g = structure_to_graph(s, 4.0, tm)
    b = collate([g], n_node=112, n_edge=2304, n_graph=1)
    return s, tm, {
        k: jnp.asarray(v) for k, v in b.items()
        if k not in (K.INFO, K.USER_LABEL)
    }


def test_forward_shapes_and_finite(hf_o_batch):
    s, tm, batch = hf_o_batch
    spec = build_model_spec(small_config(tm))
    params = init_params(spec, 0)
    out = apply_model(spec, params, batch)
    assert out[K.PRED_TOTAL_ENERGY].shape == (1,)
    assert out[K.PRED_FORCE].shape == (112, 3)
    assert out[K.PRED_STRESS].shape == (1, 6)
    assert np.isfinite(np.asarray(out[K.PRED_FORCE])).all()
    # padded nodes have exactly zero force
    np.testing.assert_array_equal(np.asarray(out[K.PRED_FORCE][96:]), 0.0)


def test_energy_extensive_under_padding(hf_o_batch):
    # growing the padding must not change energy/forces at all
    s, tm, batch = hf_o_batch
    spec = build_model_spec(small_config(tm))
    params = init_params(spec, 0)
    out1 = apply_model(spec, params, batch)
    g = structure_to_graph(s, 4.0, tm)
    b2 = collate([g], n_node=160, n_edge=2560, n_graph=3)
    b2 = {k: jnp.asarray(v) for k, v in b2.items()
          if k not in (K.INFO, K.USER_LABEL)}
    out2 = apply_model(spec, params, b2)
    np.testing.assert_allclose(
        float(out1[K.PRED_TOTAL_ENERGY][0]),
        float(out2[K.PRED_TOTAL_ENERGY][0]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out1[K.PRED_FORCE][:96]),
        np.asarray(out2[K.PRED_FORCE][:96]), atol=1e-5,
    )


def test_rotation_invariance_and_equivariance(hf_o_batch):
    from scipy.spatial.transform import Rotation

    s, tm, batch = hf_o_batch
    spec = build_model_spec(small_config(tm))
    params = init_params(spec, 0)
    out = apply_model(spec, params, batch)
    R = Rotation.random(random_state=7).as_matrix()
    b2 = dict(batch)
    b2[K.POS] = batch[K.POS] @ jnp.asarray(R.T, dtype=batch[K.POS].dtype)
    b2[K.CELL] = batch[K.CELL] @ jnp.asarray(R.T, dtype=batch[K.CELL].dtype)
    out2 = apply_model(spec, params, b2)
    np.testing.assert_allclose(
        float(out2[K.PRED_TOTAL_ENERGY][0]),
        float(out[K.PRED_TOTAL_ENERGY][0]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out2[K.PRED_FORCE][:96]),
        np.asarray(out[K.PRED_FORCE][:96]) @ R.T, atol=1e-4,
    )


def test_translation_invariance(hf_o_batch):
    s, tm, batch = hf_o_batch
    spec = build_model_spec(small_config(tm))
    params = init_params(spec, 0)
    out = apply_model(spec, params, batch)
    b2 = dict(batch)
    b2[K.POS] = batch[K.POS] + jnp.asarray([1.3, -0.7, 2.1])
    out2 = apply_model(spec, params, b2)
    np.testing.assert_allclose(
        float(out2[K.PRED_TOTAL_ENERGY][0]),
        float(out[K.PRED_TOTAL_ENERGY][0]), rtol=1e-6,
    )


def test_forces_match_finite_difference(hf_o_batch):
    s, tm, batch = hf_o_batch
    spec = build_model_spec(small_config(tm))
    params = init_params(spec, 0)
    batch64 = {
        k: (v.astype(jnp.float64) if v.dtype == jnp.float32 else v)
        for k, v in batch.items()
    }
    fwd = jax.jit(lambda b: apply_model(spec, params, b))
    out = fwd(batch64)
    eps = 1e-5
    for (a, ax) in [(3, 1), (40, 0)]:
        pp = np.asarray(batch64[K.POS]).copy()
        pm = pp.copy()
        pp[a, ax] += eps
        pm[a, ax] -= eps
        fd = -(
            fwd({**batch64, K.POS: jnp.asarray(pp)})[K.PRED_TOTAL_ENERGY][0]
            - fwd({**batch64, K.POS: jnp.asarray(pm)})[K.PRED_TOTAL_ENERGY][0]
        ) / (2 * eps)
        np.testing.assert_allclose(
            float(fd), float(out[K.PRED_FORCE][a, ax]), atol=1e-6
        )


def test_stress_matches_finite_difference(hf_o_batch):
    s, tm, batch = hf_o_batch
    spec = build_model_spec(small_config(tm))
    params = init_params(spec, 0)
    batch64 = {
        k: (v.astype(jnp.float64) if v.dtype == jnp.float32 else v)
        for k, v in batch.items()
    }
    fwd = jax.jit(lambda b: apply_model(spec, params, b))
    S = np.asarray(fwd(batch64)[K.PRED_STRESS][0])
    vol = float(batch64[K.CELL_VOLUME][0])
    h = 1e-6

    def strained(em):
        I = np.eye(3) + em
        b = dict(batch64)
        b[K.POS] = batch64[K.POS] @ jnp.asarray(I.T)
        b[K.CELL] = batch64[K.CELL] @ jnp.asarray(I.T)
        return b

    for (i, j, vi) in [(0, 0, 0), (1, 1, 1), (0, 1, 3), (2, 0, 5)]:
        em = np.zeros((3, 3))
        em[i, j] = h
        if i != j:
            em[j, i] = h
        dE = (
            fwd(strained(em))[K.PRED_TOTAL_ENERGY][0]
            - fwd(strained(-em))[K.PRED_TOTAL_ENERGY][0]
        ) / (2 * h)
        factor = 1.0 if i == j else 2.0
        np.testing.assert_allclose(
            -float(dE) / vol / factor, S[vi], atol=1e-8
        )


def test_irreps_manual_and_layers():
    tm = {8: 0, 72: 1}
    cfg = small_config(
        tm,
        **{
            K.IRREPS_MANUAL: ['8x0e', '8x0e+4x1o', '8x0e'],
            K.NUM_CONVOLUTION: 2,
        },
    )
    spec = build_model_spec(cfg)
    assert repr(spec.blocks[0].irreps_x) == '8x0e'
    assert repr(spec.blocks[0].irreps_out) == '8x0e+4x1o'
    assert repr(spec.blocks[1].irreps_out) == '8x0e'


def test_species_wise_rescale(hf_o_batch):
    s, tm, batch = hf_o_batch
    cfg = small_config(tm, **{K.SHIFT: [-3.0, -1.0], K.SCALE: [1.0, 2.0]})
    spec = build_model_spec(cfg)
    params = init_params(spec, 0)
    out = apply_model(spec, params, batch)
    assert np.isfinite(float(out[K.PRED_TOTAL_ENERGY][0]))


def test_trainable_mask():
    tm = {8: 0, 72: 1}
    spec = build_model_spec(small_config(tm))
    params = init_params(spec, 0)
    mask = trainable_mask(spec, params)
    assert mask['rescale_atomic_energy']['shift'] is False
    assert mask['0_convolution']['denominator'] is False
    assert mask['0_self_interaction_1']['w0'] is True
