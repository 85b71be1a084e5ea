"""Every config key is either read by some code path or explicitly
registered as vestigial (reference-compat, warned on override).

The walk covers TRAIN.*, TEST.*, TPU.*, RESNET.*, MOBILENET.* and the
top-level scalars. "Read" means the dotted key (or its phase-generic form —
TRAIN/TEST keys read via `phase.KEY` in spec_from_cfg) appears in package
source outside config.py.
"""

import re
import subprocess
from pathlib import Path

import pytest

from tf_faster_rcnn_tpu.config import (STRUCTURAL_KEYS, VESTIGIAL_KEYS, cfg,
                                       cfg_from_list)

REPO = Path(__file__).resolve().parent.parent


def _package_source():
    files = []
    for root in ('tf_faster_rcnn_tpu', 'tools'):
        files += [p for p in (REPO / root).rglob('*.py')
                  if p.name != 'config.py']
    files += [REPO / 'bench.py', REPO / '__graft_entry__.py']
    src = '\n'.join(p.read_text() for p in files if p.exists())
    # config.py itself has real readers (canvas_hw, get_output_dir) below
    # the defaults block; include everything after the defaults
    cfg_src = (REPO / 'tf_faster_rcnn_tpu' / 'config.py').read_text()
    # skip the defaults AND the vestigial registry (whose own comments name
    # keys); real readers (canvas_hw, get_output_dir, ...) come after
    src += cfg_src[cfg_src.index('def _merge_a_into_b'):]
    return src


SRC = _package_source()


def _mentions(text, dotted):
    return bool(re.search(re.escape(dotted) + r'(?![A-Z_0-9])', text))


def _is_read(section, key):
    if section:
        if _mentions(SRC, f'{section}.{key}'):
            return True
        # TRAIN/TEST keys snapshotted mode-generically via `phase.KEY`
        # (models/network.py::spec_from_cfg)
        if section in ('TRAIN', 'TEST') and _mentions(SRC, f'phase.{key}'):
            return True
        return False
    return _mentions(SRC, f'cfg.{key}')


def _walk():
    for section in ('TRAIN', 'TEST', 'TPU', 'RESNET', 'MOBILENET'):
        for key in getattr(cfg, section):
            yield section, key
    for key, value in cfg.items():
        if not isinstance(value, dict):
            yield '', key


@pytest.mark.parametrize('section,key', list(_walk()))
def test_key_read_or_vestigial(section, key):
    dotted = f'{section}.{key}' if section else key
    if dotted in VESTIGIAL_KEYS or dotted in STRUCTURAL_KEYS:
        assert not _is_read(section, key), (
            f'{dotted} is marked vestigial/structural but source reads it — '
            f'remove it from the registry')
    else:
        assert _is_read(section, key), (
            f'{dotted} is neither read anywhere nor registered as vestigial/'
            f'structural — a YAML override of it would be a silent no-op')


def test_vestigial_override_warns(capsys):
    cfg_from_list(['TRAIN.BBOX_REG', 'False'])
    out = capsys.readouterr().out
    assert 'TRAIN.BBOX_REG' in out and 'WARNING' in out


def test_vestigial_registry_matches_reference():
    """Every vestigial key must be equally unread in the reference tree
    (i.e. we are not silently dropping real reference behavior)."""
    ref = Path('/root/reference')
    if not ref.exists():
        pytest.skip('reference tree not present')
    src = subprocess.run(
        ['grep', '-rn', '--include=*.py', '--include=*.pyx', 'cfg',
         str(ref / 'lib'), str(ref / 'tools')],
        capture_output=True, text=True).stdout
    for dotted in sorted(VESTIGIAL_KEYS):
        leaf = dotted.rsplit('.', 1)[-1]
        reads = [ln for ln in src.splitlines()
                 if (_mentions(ln, f'cfg.{dotted}')
                     # phase-generic access, e.g. cfg[cfg_key].RPN_NMS_THRESH
                     or _mentions(ln, f'cfg[cfg_key].{leaf}'))
                 and 'lib/model/config.py' not in ln
                 and '#' != ln.split(':', 2)[-1].strip()[:1]
                 # writes (demo.py sets TEST.HAS_RPN) are not reads
                 and not re.search(rf'cfg\.{re.escape(dotted)}\s*=', ln)]
        assert not reads, (dotted, reads[:3])
