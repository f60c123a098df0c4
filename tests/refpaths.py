"""Shared location of the reference checkout's data files.

Tests that compare against reference meshes/scenes resolve paths through
here so other hosts can point DOT_REFERENCE_DIR at their own checkout
(the tests skip cleanly when the data is absent).
"""

import os

REF_DIR = os.environ.get("DOT_REFERENCE_DIR", "/root/reference")


def ref_path(*parts):
    return os.path.join(REF_DIR, *parts)
