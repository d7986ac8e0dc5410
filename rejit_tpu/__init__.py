"""rejit_tpu: a TPU-native regex/string-matching framework.

Brand-new implementation of the capability set of `coreperf/rejit`
(MatchFull/MatchAnywhere/MatchFirst/MatchAll/MatchAllCount, Replace*,
reusable compiled patterns, grep/benchmark tooling) designed TPU-first:
patterns compile ahead-of-time to dense DFA tables; matching runs as
JAX/XLA/Pallas programs (blocked transition gather + associative state-map
scans + parallel span emission); scaling is data-parallel corpus sharding
over a jax.sharding.Mesh with ICI collectives. See SURVEY.md and
docs/SEMANTICS.md.
"""

from .api import (  # noqa: F401
    DeviceCorpus,
    MatchAll,
    MatchAllCount,
    MatchAnywhere,
    MatchFirst,
    MatchFull,
    Pattern,
    Regej,
    Replace,
    ReplaceAll,
    ReplaceFirst,
    compile,
    match_all,
    match_all_count,
    match_anywhere,
    match_first,
    match_full,
    replace,
    replace_all,
    replace_each,
    replace_first,
    split,
    stage,
)
from .config import Config  # noqa: F401
from .errors import CompileError, RegexpError, RejitTpuError  # noqa: F401

__version__ = "0.1.0"
