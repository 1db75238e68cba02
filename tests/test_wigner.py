import numpy as np

from sevennet_finetuning_tpu.ops.wigner import (
    su2_clebsch_gordan,
    wigner_3j,
)
from tests.helpers import wigner_D_from_R


def test_su2_cg_orthogonality():
    # sum over (m1,m2) of C[m1,m2,m3] C[m1,m2,m3'] = delta(m3,m3')
    for (j1, j2, j3) in [(1, 1, 1), (1, 1, 2), (2, 1, 2), (2, 2, 3)]:
        C = su2_clebsch_gordan(j1, j2, j3)
        gram = np.einsum('abm,abn->mn', C, C)
        np.testing.assert_allclose(gram, np.eye(2 * j3 + 1), atol=1e-12)


def test_w3j_golden_111():
    # e3nn's w3j(1,1,1): +-1/sqrt(6) on even/odd permutations of (0,1,2)
    # (verified against the reference's deployed TorchScript constants)
    w = wigner_3j(1, 1, 1)
    v = 1.0 / np.sqrt(6.0)
    expect = np.zeros((3, 3, 3))
    for (i, j, k) in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        expect[i, j, k] = v
    for (i, j, k) in [(0, 2, 1), (2, 1, 0), (1, 0, 2)]:
        expect[i, j, k] = -v
    np.testing.assert_allclose(w, expect, atol=1e-12)


def test_w3j_l0_identity():
    w = wigner_3j(0, 1, 1)
    np.testing.assert_allclose(
        w[0], np.eye(3) / np.sqrt(3.0), atol=1e-12
    )


def test_w3j_unit_norm():
    for (l1, l2, l3) in [(1, 1, 2), (2, 2, 2), (2, 1, 3), (3, 2, 1)]:
        w = wigner_3j(l1, l2, l3)
        assert abs(np.linalg.norm(w) - 1.0) < 1e-12


def test_w3j_rotation_invariance():
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=7).as_matrix()
    for (l1, l2, l3) in [(1, 1, 2), (2, 1, 2), (2, 2, 3)]:
        w = wigner_3j(l1, l2, l3)
        D1 = wigner_D_from_R(l1, R)
        D2 = wigner_D_from_R(l2, R)
        D3 = wigner_D_from_R(l3, R)
        w_rot = np.einsum('ia,jb,kc,abc->ijk', D1, D2, D3, w)
        np.testing.assert_allclose(w_rot, w, atol=1e-5)
