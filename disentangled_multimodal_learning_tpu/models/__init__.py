from .factory import define_net  # noqa: F401
