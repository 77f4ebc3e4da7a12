"""Shared infrastructure for lake-persisted index families.

``loop.py`` holds the plumbing every family reimplemented before round 8:
content-version directories, build-iff-missing, working copies, staged
day-file streams, the availableNow foreachBatch runner, maintenance
compaction, and materialization-mode-aware reclamation. The families
themselves stay in their domain modules (``functions/dedup_index.py``,
``functions/ann_index.py``, ``functions/sketches.py``,
``functions/text_index.py``) — the harness is mechanism, not policy.
"""
