"""Checkout-only shims over ams_tpu.cli (NOT installed — see pyproject).

Each module re-exports ``main(argv=None)`` from its ams_tpu.cli
counterpart so ``python cli/run.py ...`` keeps working from a checkout;
installed environments get the ``ams-*`` console scripts instead.
"""
