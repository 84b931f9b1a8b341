from trustfuse_ray import compat as _compat

_compat.install()
