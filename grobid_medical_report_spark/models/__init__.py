"""Fitted model artifacts (JSON) + a zip-safe loader.

The north-rule packaging ships the engine as ``spark-submit --py-files
engine.zip`` — inside a zip, filesystem ``open()`` on a package path fails
(NotADirectoryError), so every model loader goes through
``importlib.resources``, which resolves from directories AND zipimport
alike. The trainers (tools/train_*.py) still WRITE to the repo checkout
path; loading is the only thing that must work everywhere.
"""

from __future__ import annotations

import json
from importlib import resources


def load_model(name: str) -> dict:
    return json.loads(resources.files(__name__).joinpath(name).read_text())
