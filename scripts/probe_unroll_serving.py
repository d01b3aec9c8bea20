"""Does scan ``unroll`` help the feedback nets' SERVING path?

Training unroll won 25-29% (backward stash fusion). Serving is
forward-only — the scan stash there is the (num_steps, N, H, W, C)
output stack the protocol already wants — so the mechanism is absent;
this measures whether straight-lining the 4 feedback steps still buys
cross-step fusion. Uses the zoo bench harness verbatim (same protocol /
shapes / chained timing), A/B in one session; runs from /tmp so the
canonical zoo_serving.json is untouched.

Run: python scripts/probe_unroll_serving.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.bench_zoo_serving as z  # noqa: E402

NETS = ["SRFBNet", "DRFSISRNet"]


def main() -> None:
    os.chdir("/tmp")  # keep the harness's json writes out of the repo
    orig = z.build_cases

    def rolled(subpixel=False, fsq=False):
        # the zoo cases ship unroll=num_steps now - pin the baseline leg
        # back to the rolled scan so the A/B stays valid
        return [(n, f, t, net.clone(unroll=1), o)
                for (n, f, t, net, o) in orig(subpixel, fsq) if n in NETS]

    z.build_cases = rolled
    print("== baseline (rolled scan) ==", flush=True)
    z.main(list(NETS))

    def unrolled(subpixel=False, fsq=False):
        return [(n, f, t, net.clone(unroll=net.num_steps), o)
                for (n, f, t, net, o) in orig(subpixel, fsq) if n in NETS]

    z.build_cases = unrolled
    print("== unroll=num_steps ==", flush=True)
    z.main(list(NETS))


if __name__ == "__main__":
    main()
