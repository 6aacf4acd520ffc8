"""Per-stage profile of a 0010_pt progression — superseded by
bench/stages.py, which prints each row AS IT COMPLETES and uses the
persistent compile cache (the round-3/4 version of this file tried to
time everything before printing and routinely outran its timeout on the
remote-compile tunnel; VERDICT r4 weak #9).

    python -m bench.profile   ==   python -m bench.stages
"""
from .stages import main

if __name__ == '__main__':
    main()
