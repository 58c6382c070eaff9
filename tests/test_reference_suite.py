"""Run the reference's own four test modules UNMODIFIED against the root
reference-API shims (transforms.py, pipeline.py, metrics.py, utils.py) —
SURVEY §4's "the rebuild should keep these four test modules passing".

Each reference ``*_test.py`` is executed from source with the repo root
first on sys.path, so ``from transforms import *`` etc. resolve to the
shims. Expected outcomes mirror the reference's own status in its original
environment: every test passes, except the three utils_test stubs that
``raise NotImplemented`` (a TypeError in any environment —
utils_test.py:52,85,88 are broken in the reference itself).

The seeded tf.random golden-array cases (transforms_test.py:10-43) are
RUN, not skipped: the shim's ``mask``/``random_shift`` draw the same global
RNG stream (verified to still reproduce the goldens under this TF build).
"""

import os
import sys
import unittest

import pytest

REF = '/root/reference'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference not mounted')

# utils_test stubs that error in the reference environment too
EXPECTED_BROKEN = {
    'utils_test.py': {'test_load_data', 'test_safe_div', 'test_predict'},
}


def _run_reference_module(fname):
    pytest.importorskip('tensorflow')
    from challenge_tpu.interop.refstubs import install_stubs
    install_stubs()   # torchaudio import at the top of transforms_test.py

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    # evict any stale same-named modules (e.g. a REFERENCE 'utils' imported
    # by another test via sys.path games) so the repo-root shims resolve
    for name in ('transforms', 'data_utils', 'pipeline', 'utils', 'metrics',
                 'swa'):
        mod = sys.modules.get(name)
        mod_file = getattr(mod, '__file__', '') or ''
        if mod is not None and not mod_file.startswith(REPO + os.sep):
            del sys.modules[name]
    src = open(os.path.join(REF, fname)).read()
    ns = {'__name__': f'reference_{fname[:-3]}', '__file__': fname}
    exec(compile(src, fname, 'exec'), ns)

    loader = unittest.TestLoader()
    suite = unittest.TestSuite()
    for obj in ns.values():
        if (isinstance(obj, type) and issubclass(obj, unittest.TestCase)
                and obj is not unittest.TestCase):
            suite.addTests(loader.loadTestsFromTestCase(obj))
    result = unittest.TestResult()
    suite.run(result)

    allowed = EXPECTED_BROKEN.get(fname, set())
    problems = []
    broken_hit = set()
    for case, tb in result.failures + result.errors:
        name = case.id().rsplit('.', 1)[-1]
        if name in allowed:
            broken_hit.add(name)
        else:
            problems.append(f'{case.id()}\n{tb}')
    assert not problems, (
        f'{fname}: {len(problems)} unexpected failure(s):\n'
        + '\n'.join(problems))
    assert result.testsRun > 0, f'{fname}: no tests collected'
    return result.testsRun, broken_hit


@pytest.mark.slow
def test_reference_transforms_test_passes():
    ran, _ = _run_reference_module('transforms_test.py')
    assert ran >= 8   # incl. the seeded mask/random_shift goldens


@pytest.mark.slow
def test_reference_pipeline_test_passes():
    ran, _ = _run_reference_module('pipeline_test.py')
    assert ran >= 2


def test_reference_metrics_test_passes():
    ran, _ = _run_reference_module('metrics_test.py')
    assert ran >= 1


@pytest.mark.slow
def test_reference_utils_test_passes():
    ran, broken = _run_reference_module('utils_test.py')
    assert ran >= 6
    # the reference's own three broken stubs, and nothing else
    assert broken == EXPECTED_BROKEN['utils_test.py']


def test_every_reference_toplevel_symbol_resolves():
    """Beyond the four test modules: EVERY top-level def/class of EVERY
    reference module resolves through the root shims (reference users
    import freely across entry points, e.g. eval.py:9
    ``from sj_train import get_model, ARGS``)."""
    import ast
    import importlib

    for fname in ('transforms', 'data_utils', 'pipeline', 'utils',
                  'metrics', 'swa', 'sj_train', 'trainer', 'eval',
                  'get_csv_data'):
        with open(f'{REF}/{fname}.py') as f:
            tree = ast.parse(f.read())
        names = [n.name for n in tree.body
                 if isinstance(n, (ast.FunctionDef, ast.ClassDef))
                 and not n.name.startswith('_')]
        mod = importlib.import_module(fname)
        missing = [n for n in names if not hasattr(mod, n)]
        assert not missing, f'{fname}: shim lacks {missing}'
