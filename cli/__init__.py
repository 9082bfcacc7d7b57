"""Console entry points (see pyproject [project.scripts]).

Each module exposes ``main(argv=None)`` so the scripts work both as
``python cli/run.py ...`` from a checkout and as installed ``ams-*``
commands.
"""
