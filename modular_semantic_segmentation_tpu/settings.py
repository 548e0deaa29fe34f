"""Machine-local settings.

The reference expects a user-written, gitignored ``xview/settings.py`` with
DATA_BASEPATH / EXP_OUT / EXPERIMENT_STORAGE_FOLDER (SURVEY.md §2.7). We
keep that contract but resolve in order:

1. a user module ``msstpu_settings`` on the import path,
2. environment variables of the same names,
3. defaults under ``~/.msstpu``.
"""

import os

_DEFAULT_ROOT = os.path.expanduser("~/.msstpu")

try:
    import msstpu_settings as _user  # type: ignore
except ImportError:
    _user = None


def _resolve(name, default):
    if _user is not None and hasattr(_user, name):
        return getattr(_user, name)
    return os.environ.get(name, default)


DATA_BASEPATH = _resolve("DATA_BASEPATH", os.path.join(_DEFAULT_ROOT, "data"))
EXP_OUT = _resolve("EXP_OUT", os.path.join(_DEFAULT_ROOT, "exp"))
EXPERIMENT_STORAGE_FOLDER = _resolve(
    "EXPERIMENT_STORAGE_FOLDER", os.path.join(_DEFAULT_ROOT, "experiments"))

# Optional MongoDB observer settings (reference experiments/utils.py:25-37)
EXPERIMENT_DB_HOST = _resolve("EXPERIMENT_DB_HOST", None)
EXPERIMENT_DB_USER = _resolve("EXPERIMENT_DB_USER", None)
EXPERIMENT_DB_PWD = _resolve("EXPERIMENT_DB_PWD", None)
EXPERIMENT_DB_NAME = _resolve("EXPERIMENT_DB_NAME", None)
