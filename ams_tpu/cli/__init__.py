"""Command-line entry points (installed as ``ams-*`` scripts).

Modules: ``run`` (experiment driver, reference run.py flags),
``extract_labels`` (teacher labeler), ``serve`` / ``edge`` (live TCP
runtime).  The repo-root ``cli/*.py`` files are thin checkout shims over
these so ``python cli/run.py ...`` keeps working without installing.
"""
