"""``python -m swisscourtrulingcorpus_spark`` — the `python -m
scrc.main` counterpart (`scrc/main.py:45-66`): build the corpus tables
then the datasets, end to end.

Usage::

    python -m swisscourtrulingcorpus_spark [OUT_DIR]

``SCRC_N_DOCS`` sizes the fixture corpus when no landing zone is given.
"""

from swisscourtrulingcorpus_spark.pipeline import main

if __name__ == "__main__":
    main()
