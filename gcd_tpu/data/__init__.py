from gcd_tpu.data import geometry, common

try:
    from gcd_tpu.data.kubric import KubricSynthViewDataset, KubricSynthViewModule  # noqa: F401
except ImportError:
    pass
try:
    from gcd_tpu.data.pardom import (  # noqa: F401
        ParallelDomainSynthViewDataset,
        ParallelDomainSynthViewModule,
    )
except ImportError:
    pass
