"""Reusable Column-level building blocks.

Everything here returns Catalyst ``Column`` expressions (JVM-side,
whole-stage-codegen'd) — never row-at-a-time Python UDFs. The reference ran
*all* user logic as per-record Python (reference task_executor.py:144-149);
keeping these JVM-side is the single biggest throughput lever of the
rewrite.
"""

from .numeric import davg, dsum, sql_davg, sql_dsum  # noqa: F401
from .text import tokens, word_tokens  # noqa: F401
from .timeutil import us_between  # noqa: F401
