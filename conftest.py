"""Repo-root conftest: lets bare ``pytest`` collect the suite.

The tests import the package, ``__spark_entry__``, and each other
absolutely; ``python -m pytest`` puts the repo root on sys.path
implicitly, but a bare ``pytest`` invocation does not (no installed
package, no pyproject pythonpath) — collection would die at the first
import. This file is on every pytest rootdir path, so both entry forms
work.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
