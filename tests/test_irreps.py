import numpy as np
import pytest

from sevennet_finetuning_tpu.irreps import Irrep, Irreps, tp_out_irreps


def test_parse_roundtrip():
    irr = Irreps('128x0e+64x1o+32x2e')
    assert repr(irr) == '128x0e+64x1o+32x2e'
    assert irr.dim == 128 + 64 * 3 + 32 * 5
    assert irr.num_irreps == 128 + 64 + 32
    assert irr.lmax == 2


def test_irrep_product_selection_rule():
    out = list(Irrep.parse('1o') * Irrep.parse('2e'))
    assert out == [Irrep(1, -1), Irrep(2, -1), Irrep(3, -1)]


def test_sort_e3nn_order():
    irr = Irreps('1x1e+1x0o+1x0e+1x1o')
    s, perm, _ = irr.sort()
    # e3nn order: odd before even within each l
    assert repr(s) == '1x0o+1x0e+1x1o+1x1e'
    # perm maps old position -> new position
    assert [s[p].ir for p in perm] == [mi.ir for mi in irr]


def test_simplify():
    irr = Irreps('2x0e+3x0e+1x1o+1x1o')
    assert repr(irr.simplify()) == '5x0e+2x1o'


def test_slices():
    irr = Irreps('2x0e+1x1o')
    assert irr.slices() == [slice(0, 2), slice(2, 5)]


def test_spherical_harmonics_irreps():
    assert repr(Irreps.spherical_harmonics(2, p=-1)) == '1x0e+1x1o+1x2e'
    assert repr(Irreps.spherical_harmonics(2, p=1)) == '1x0e+1x1e+1x2e'


def test_tp_out_irreps_modes():
    x = Irreps('4x0e+4x1o')
    f = Irreps.spherical_harmonics(2, p=-1)
    full = tp_out_irreps(x, f, drop_l=2, parity_mode='full')
    # products: 0e x (0e,1o,2e) + 1o x (0e,1o,2e) ->
    # 0e,1o,2e (from 0e) and 1o,(0e,1e,2e),(1o,2o,3o) from 1o
    assert Irrep.parse('0e') in full and Irrep.parse('2o') in full
    even = tp_out_irreps(x, f, drop_l=2, parity_mode='even')
    assert all(mi.ir.p == 1 for mi in even)
    sph = tp_out_irreps(x, f, drop_l=2, parity_mode='sph')
    assert all(mi.ir.p == (-1) ** mi.ir.l for mi in sph)
    fixed = tp_out_irreps(x, f, drop_l=1, parity_mode='sph',
                          fix_multiplicity=8)
    assert all(mi.mul == 8 for mi in fixed)
