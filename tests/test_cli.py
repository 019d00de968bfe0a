"""Smoke tests for the CLI surface: every script must import and answer --help."""
import os
import subprocess
import sys

import pytest

# compile-heavy: excluded from the sub-5-minute smoke profile
# (`pytest -m 'not slow'`); the full default suite still runs these
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLI_SCRIPTS = [
    'train_nip.py', 'train_dcn.py', 'train_manipulation.py',
    'train_prepare_training_set.py', 'develop_images.py', 'test_nip.py',
    'test_dcn.py', 'test_dcn_rate_dist.py', 'test_fan.py', 'test_jpeg.py',
    'test_framework.py', 'diff_nip.py', 'results.py', 'summarize_nip.py',
    'pstrace.py', 'bench.py', 'bench_suite.py',
]


@pytest.mark.parametrize('script', CLI_SCRIPTS)
def test_cli_help(script):
    env = dict(os.environ, NI_TPU_PLATFORM='cpu')
    if script in ('bench.py', 'bench_suite.py'):
        # no argparse; only check importability
        proc = subprocess.run([sys.executable, '-c',
                               f'import ast; ast.parse(open("{script}").read())'],
                              cwd=REPO, capture_output=True, text=True, env=env)
        assert proc.returncode == 0, proc.stderr
        return
    proc = subprocess.run([sys.executable, script, '--help'], cwd=REPO,
                          capture_output=True, text=True, env=env, timeout=240)
    assert proc.returncode == 0, proc.stderr[-500:]
    assert 'usage' in proc.stdout.lower()


def test_train_nip_dry_run():
    env = dict(os.environ, NI_TPU_PLATFORM='cpu')
    proc = subprocess.run(
        [sys.executable, 'train_nip.py', '--nip', 'INet', '--dry',
         '--params', "{'kernel': 7}"],
        cwd=REPO, capture_output=True, text=True, env=env, timeout=240)
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "'kernel': 7" in proc.stdout
