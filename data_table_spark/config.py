"""Engine tunables mirroring the reference's configuration constants.

Reference citations (into /root/reference/):
- ``*guessing-types-sample-size*`` = 1000  (data-table.lisp:292-293)
- ``+largest-number+`` = 2^63              (data-table.lisp:266-267)
- ``*list-delimiter*`` = ", "              (data-table.lisp:434-435)
- NBSP-aware whitespace trimbag            (data-table.lisp:40-43)
"""

from __future__ import annotations

from dataclasses import dataclass

#: Values with |v| >= 2^63 are demoted to string (fit-in-a-database rule,
#: data-table.lisp:266-267, 274-276).
LARGEST_NUMBER = 2**63

#: Reservoir-sample cap for type inference (data-table.lisp:292-293).
GUESSING_TYPES_SAMPLE_SIZE = 1000

#: Delimiter used when rendering array/list cells (data-table.lisp:434-435).
LIST_DELIMITER = ", "

#: Whitespace characters trimmed by the reference, including NBSP
#: (data-table.lisp:40-43). Used inside regex character classes.
WHITESPACE_CLASS = r"\s "


@dataclass
class EngineConfig:
    """Per-engine-instance tunables; defaults reproduce the reference."""

    guessing_sample_size: int = GUESSING_TYPES_SAMPLE_SIZE
    largest_number: int = LARGEST_NUMBER
    list_delimiter: str = LIST_DELIMITER
    #: 'raise' reproduces the reference's ``bad-type-guess`` error path
    #: (data-table.lisp:345-355); 'string' reproduces the
    #: ``assume-column-is-string`` restart (data-table.lisp:398-404).
    on_coerce_error: str = "string"
    #: 'suffix' reproduces ``add-numeric-suffix-to-all``
    #: (clsql-data-table.lisp:149-181); 'raise' the bare condition.
    on_duplicate_column: str = "suffix"


DEFAULT_CONFIG = EngineConfig()
