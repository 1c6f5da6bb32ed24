"""Golden-fixture provenance: tools/make_golden.py must regenerate the
checked-in reference-C fixtures bit-identically (reference pipeline
analog: functional_tester/test.py:1146-1186 + libgen.py:322)."""

import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_MECH = pathlib.Path('/root/reference/data/h2o2.inp')


@pytest.mark.slow
@pytest.mark.skipif(not REF_MECH.exists() or not shutil.which('gcc'),
                    reason='reference tree or gcc unavailable')
@pytest.mark.parametrize('args,fixture', [
    (['--mech', str(REF_MECH)], 'golden_h2o2_refc.npz'),
    (['--mech', str(REF_MECH), '--conv'], 'golden_h2o2_refc_conv.npz'),
    (['--synthetic', '9,24,7'], 'golden_synth_refc.npz'),
])
def test_golden_regenerates_bit_identical(args, fixture, tmp_path):
    fx = REPO / 'tests' / 'data' / fixture
    out = tmp_path / 'regen.npz'
    res = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'make_golden.py'),
         '--from-golden', str(fx), '--out', str(out),
         '--compare', str(fx)] + args,
        capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'BIT-IDENTICAL' in res.stdout
