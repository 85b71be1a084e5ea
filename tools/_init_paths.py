"""Make the repo importable when tools are run as scripts.

Also honors FRCNN_PLATFORM (e.g. ``FRCNN_PLATFORM=cpu``): some machines
register a TPU plugin from sitecustomize BEFORE the JAX_PLATFORMS env var
is read, so the env var silently fails to pin the platform; the in-process
config update below is the only reliable pin. Used by CPU smokes of the
CLI tools (tools/coco_rehearsal.py, tests) so they never touch a TPU that
a concurrent hardware run owns.
"""

import os
import os.path as osp
import sys

repo_root = osp.abspath(osp.join(osp.dirname(__file__), '..'))
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

_platform = os.environ.get("FRCNN_PLATFORM")
if _platform:
    import jax
    jax.config.update("jax_platforms", _platform)
