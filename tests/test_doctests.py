"""Doc-tests as API smoke tests.

The reference documents its public APIs with runnable doc examples that
double as smoke tests (``src/lib.rs:13-36``, ``src/bufferpool.rs:176-186``,
``src/metering.rs:7-20``, ``src/blocks/filters.rs:47-58``,
``src/blocks/transform.rs:22-28``); this runs our equivalents.
"""

import doctest

import pytest

import radiorust_tpu.bufferpool
import radiorust_tpu.metering
import radiorust_tpu.prelude
import radiorust_tpu.blocks.filters

MODULES = [
    radiorust_tpu.prelude,
    radiorust_tpu.bufferpool,
    radiorust_tpu.metering,
    radiorust_tpu.blocks.filters,
]


@pytest.mark.parametrize("mod", MODULES, ids=[m.__name__ for m in MODULES])
def test_doctests(mod):
    result = doctest.testmod(mod, verbose=False)
    assert result.attempted > 0, f"{mod.__name__} has no doc examples"
    assert result.failed == 0
