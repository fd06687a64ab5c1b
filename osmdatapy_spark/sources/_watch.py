"""Shared offset discipline for the directory-watcher stream sources.

Both watchers (``xml.py:OsmXmlSimpleStreamReader`` over ``.osc``
changefiles, ``pbf.py:OsmPbfSimpleStreamReader`` over ``.pbf`` epoch
extracts) key their offsets on the last processed file's BASENAME, so
the listing they advance over must sort by basename and each basename
must be unique — this module is the single implementation of that
contract, so a hardening applied to one watcher cannot silently miss
the other.
"""

from __future__ import annotations


def list_watched_files(path: str, suffixes: tuple[str, ...], source_name: str) -> list[str]:
    """Basename-ordered listing of the files a watcher advances over.

    Sorted by BASENAME — the offset scalar compares basenames, so the
    sort key and the offset key must agree, or a glob spanning multiple
    directories could emit a file whose basename sorts above the
    recorded end offset (duplicates on replay).  Basenames must be
    zero-padded (the replication-sequence contract, ``000123.osc``):
    lexicographic order is the arrival order only then — ``9.osc``
    sorting after ``10.osc`` would be silently skipped.  Duplicate
    basenames across a multi-directory glob make the offset ambiguous
    and are rejected loudly.
    """
    import glob
    import os

    if os.path.isdir(path):
        files = [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(suffixes)
        ]
    else:
        # an explicit glob already states the pattern — don't second-guess
        # its extension (both watchers' batch readers do the same)
        files = glob.glob(path)
    files.sort(key=os.path.basename)
    seen: set[str] = set()
    dupes: set[str] = set()
    for f in files:
        n = os.path.basename(f)
        (dupes if n in seen else seen).add(n)
    if dupes:
        raise ValueError(
            f"{source_name} stream source: duplicate basenames across the "
            f"glob {sorted(dupes)[:3]} — offsets are basename-keyed, so "
            "each file must have a unique (zero-padded) name"
        )
    return files
