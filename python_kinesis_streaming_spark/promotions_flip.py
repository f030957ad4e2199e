"""The r9/r10 registration flip, as an import hook.

``registry._ensure_loaded`` only IMPORTS the modules in ``_OP_MODULES``
— registration normally happens via ``@op`` decorators at import time.
``promotions.py``'s decorators deliberately fill the parallel
``PROMOTION_OPS`` dict instead (the freeze), so importing *that* module
never grows the registry. THIS module is the bridge: importing it runs
``register_all()``, so the flip is exactly one line —

    _OP_MODULES = [
        ...,
        "python_kinesis_streaming_spark.promotions_flip",
    ]

— plus appending the promotion names (PROMOTION.md order) to
``_GRADING_PRIORITY`` behind the remaining never-graded block. Nothing
imports this module until then; direct imports of ``promotions`` (tests,
``tools/drive_promotions.py``) leave the registry frozen.
``tests/test_promotions.py::test_register_all_flip_rehearsal`` rehearses
this exact import in a subprocess every run.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.promotions import register_all

register_all()
