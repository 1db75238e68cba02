"""Config overrides for importing known reference release artifacts.

Frozen TorchScript graphs do not retain every architecture hyperparameter;
these tables pin down the shipped SevenNet releases (sources:
reference pretrained_potentials/SevenNet_0__11July2024/pre_train.yaml and
the example_inputs deployed models, decoded from their frozen graphs).
"""

from .. import keys as K

SEVENNET_0_11JULY2024 = {
    K.NODE_FEATURE_MULTIPLICITY: 128,
    K.LMAX: 2,
    K.NUM_CONVOLUTION: 5,
    K.IS_PARITY: False,
    K.SELF_CONNECTION_TYPE: 'linear',
    K.IRREPS_MANUAL: [
        '128x0e', '128x0e+64x1e+32x2e', '128x0e+64x1e+32x2e',
        '128x0e+64x1e+32x2e', '128x0e+64x1e+32x2e', '128x0e',
    ],
    K._NORMALIZE_SPH: True,
    K._RESTRICT_LAST_LAYER: True,
    K.SHIFT: [0.0] * 89,           # species-wise; values imported
    K.SCALE: [1.0] * 89,
}

# the model deployed with the reference's example_inputs/md_*_example
EXAMPLE_MD_MODEL = {
    K.NODE_FEATURE_MULTIPLICITY: 4,
    K.LMAX: 1,
    K.NUM_CONVOLUTION: 4,
    K.IS_PARITY: True,
    K.SELF_CONNECTION_TYPE: 'nequip',
    K._NORMALIZE_SPH: False,
    K._RESTRICT_LAST_LAYER: False,
}
