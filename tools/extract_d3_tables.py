"""Extract Grimme DFT-D3 reference data into d3_params.npz.

The numerical tables (covalent radii, <r^2>/<r^4> expectation values,
R0AB cutoff radii, and the C6AB reference-system table) are Grimme's
published DFT-D3 parametrization (J. Chem. Phys. 132, 154104 (2010),
dftd3 program, GPL); the reference repo carries the same data in C
headers (reference: sevenn/pair_e3gnn/pair_d3_pars.h, pair_d3.cu).
This script re-extracts them into a compact binary so the framework is
self-contained.  Run once; the .npz is committed.
"""

import re
import sys

import numpy as np

CU = '/root/reference/sevenn/pair_e3gnn/pair_d3.cu'
PARS = '/root/reference/sevenn/pair_e3gnn/pair_d3_pars.h'
OUT = 'sevennet_finetuning_tpu/data/d3_params.npz'

FLOAT = re.compile(r'[-+]?\d+\.\d+(?:[eE][-+]?\d+)?')


def floats(text):
    return [float(t) for t in FLOAT.findall(text)]


def main():
    cu = open(CU).read()

    i = cu.index('double r2r4_ref[94]')
    r2r4 = np.array(floats(cu[i:cu.index('}', i)]))
    assert r2r4.shape == (94,)

    i = cu.index('double rcov_ref[94]')
    rcov = np.array(floats(cu[i:cu.index('}', i)]))
    assert rcov.shape == (94,)

    pars = open(PARS).read()
    i = pars.index('R0AB_TABLE')
    j = pars.index('C6AB_TABLE')
    rows = re.findall(r'\{([^{}]*)\}', pars[i:j])
    r0ab = np.zeros((94, 94))
    for r, row in enumerate(rows):
        vals = floats(row)
        r0ab[r, :len(vals)] = vals
        r0ab[:len(vals), r] = vals  # symmetric (lower-triangle storage)
    assert len(rows) == 94

    rows = re.findall(r'\{([^{}]*)\}', pars[j:])
    c6ab = np.array([floats(row) for row in rows if row.strip()])
    assert c6ab.shape == (32385, 5), c6ab.shape

    np.savez_compressed(OUT, r2r4=r2r4, rcov=rcov, r0ab=r0ab, c6ab=c6ab)
    print(f'wrote {OUT}: r2r4{r2r4.shape} rcov{rcov.shape} '
          f'r0ab{r0ab.shape} c6ab{c6ab.shape}')


if __name__ == '__main__':
    main()
