"""Import side-effect module: pulls in every submodule that registers config-target
aliases, so `instantiate_from_config` can resolve both `gcd_tpu.*` and the
reference's `sgm.*` target strings from unmodified YAML configs."""

import gcd_tpu.data  # noqa: F401
import gcd_tpu.diffusion  # noqa: F401
import gcd_tpu.engine  # noqa: F401
import gcd_tpu.models  # noqa: F401
