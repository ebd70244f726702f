"""Round-trip fidelity contract for text landing formats (CSV/TSV).

A value written to a landing file and ingested back must be the value
that was written. Spark's CSV defaults break that in two silent ways
(found by the r10 `blanktext` degenerate sweep):

- the *writer* trims leading/trailing whitespace
  (``ignoreLeadingWhiteSpace``/``ignoreTrailingWhiteSpace`` default
  TRUE on write), so ``"  word  "`` lands as ``word``;
- empty string and NULL collapse: the writer emits ``""`` for an empty
  string but the *reader*'s default ``nullValue=""`` maps it back to
  NULL, so ``""`` ingests as NULL.

The contract here: whitespace is preserved verbatim on write, and NULL
is encoded as the conventional ``\\N`` sentinel (Hive/MySQL-dump
style) so the reader can tell ``""`` (quoted empty field) from NULL
(bare ``\\N``). Every landing writer and every landing reader — batch
and streaming — must apply the matching option set below; a writer and
reader with mismatched conventions is exactly the bug class this
module exists to prevent.

Documented limitation (inherent to ANY sentinel encoding): a literal
string value ``\\N`` is written unquoted and ingests as NULL. Payloads
that may legitimately contain the sentinel belong in a typed format
(parquet landing shards), not CSV — same boundary as binary columns.
Parquet landing files carry types natively and need none of this.
"""

from __future__ import annotations

#: NULL sentinel in text landing files — distinguishes NULL from "".
NULL_SENTINEL = "\\N"

#: Options for ``DataFrameWriter.csv`` on landing CSV/TSV writes.
TEXT_WRITE_OPTS: dict[str, str] = {
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "nullValue": NULL_SENTINEL,
}

#: Options for ``DataFrameReader``/``DataStreamReader`` CSV/TSV reads.
#: ``emptyValue=""`` keeps a quoted empty field an empty STRING (the
#: default also maps it to NULL, merging it with the sentinel).
#: ``multiLine`` parses quoted embedded newlines (the writer quotes
#: them; the default line-splitting reader would shear the record).
#: Scale note: multiLine disables intra-file line-split parallelism —
#: acceptable for landing objects (one small file per bus event, read
#: many-files-parallel); bulk data enters via parquet, which needs
#: none of this.
TEXT_READ_OPTS: dict[str, str] = {
    "nullValue": NULL_SENTINEL,
    "emptyValue": "",
    "multiLine": "true",
}

#: Options for reading files from FOREIGN writers (``external=True``).
#: Only the \\N/"" sentinel conventions conflict with other writers;
#: ``multiLine`` does not — standard writers (Python's ``csv.writer``,
#: RFC 4180) legitimately quote embedded newlines, and without it Spark
#: shears such records mid-field (ADVICE r11).
EXTERNAL_TEXT_READ_OPTS: dict[str, str] = {
    "multiLine": "true",
}


def with_text_options(rw, opts: dict[str, str]):
    """Apply an option dict to a DataFrameReader/Writer/StreamReader —
    all three share the ``option(k, v)`` builder shape."""
    for k, v in opts.items():
        rw = rw.option(k, v)
    return rw
