"""Entry-point plugin discovery — the reference's extension story.

The reference loads every data type, module and operation type from
setuptools entry points (``/root/reference/pyproject.toml:129-193``, loader
``src/kiara/utils/class_loading.py``): a third-party distribution declares
``[project.entry-points."kiara.modules"]`` etc. and its classes appear in
every context without the core ever importing the package by name.  This
module is the Spark engine's equivalent.  Recognized groups:

``kiara_spark.modules``
    entry point name = module type id, value = a :class:`KiaraModule`
    subclass.  Registered in the module registry; a same-named
    ``custom_module`` operation is minted so the module shows up in
    ``operation list`` (the reference's CustomModuleOperationType).
``kiara_spark.data_types``
    entry point name = type name, value = a :class:`DataType` subclass.
``kiara_spark.operations``
    value = an :class:`Operation`, an iterable of them, or a zero-arg
    callable returning either — for plugin-defined named configurations of
    (possibly core) modules.
``kiara_spark.plugin``
    value = a callable ``register(context)`` for plugins that need full
    control (the reference's ``kiara.plugin`` group of ``find_*`` hooks).
``kiara_spark.renderers``
    value = a :class:`kiara_spark.renderers.Renderer` subclass; loaded
    lazily by the RenderRegistry (renderers.py), the analog of the
    reference's ``find_all_kiara_renderers``.
``kiara_spark.cli_subcommands``
    entry point name = command name, value = a callable
    ``handler(argv: list[str]) -> int | None`` — a third-party
    distribution contributes a whole ``kiara_spark <name> ...`` command
    group, the analog of the reference's CLI assembling itself from
    entry points (``find_all_cli_subcommands``,
    ``src/kiara/utils/class_loading.py:659``, wired in
    ``src/kiara/interfaces/cli/__init__.py:187`` and mirrored by the
    proxied CLI in ``interfaces/cli/proxy_cli.py:38``).  Loaded at CLI
    dispatch time (not per-context); built-in commands always win, so a
    plugin can extend but never shadow the core surface.

Failures are isolated per entry point: a broken plugin records an error in
its plugin info and never prevents context creation (the reference logs and
continues, ``class_loading.py``).  Discovery runs once per context, after
the built-in operator families, so plugins may override nothing but extend
everything.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from .context import KiaraContext

ENTRY_POINT_GROUPS = (
    "kiara_spark.modules",
    "kiara_spark.data_types",
    "kiara_spark.operations",
    "kiara_spark.plugin",
    "kiara_spark.renderers",  # consumed lazily in renderers.RenderRegistry
    "kiara_spark.cli_subcommands",  # consumed by cli.main at dispatch time
)


class CliSubcommand:
    """A plugin-contributed CLI command: ``handler(argv) -> int | None``."""

    __slots__ = ("name", "handler", "doc", "distribution")

    def __init__(self, name: str, handler, doc: str, distribution: str):
        self.name = name
        self.handler = handler
        self.doc = doc
        self.distribution = distribution


def find_cli_subcommands() -> dict[str, "CliSubcommand"]:
    """Discover ``kiara_spark.cli_subcommands`` entry points (reference:
    ``find_all_cli_subcommands``).  Faulty plugins are skipped with a
    one-line stderr note — a broken distribution must never take down the
    core CLI (the reference's stevedore manager logs and continues)."""
    import sys
    from importlib.metadata import entry_points

    out: dict[str, CliSubcommand] = {}
    for ep in entry_points(group="kiara_spark.cli_subcommands"):
        dist = getattr(getattr(ep, "dist", None), "name", None) or "<unknown>"
        try:
            handler = ep.load()
            if not callable(handler):
                raise TypeError(f"{ep.value} is not callable")
        except Exception as exc:  # noqa: BLE001 — isolate faulty plugins
            print(f"warning: skipping CLI subcommand {ep.name!r} "
                  f"from {dist}: {exc}", file=sys.stderr)
            continue
        doc = (handler.__doc__ or "").strip().split("\n")[0]
        out[ep.name] = CliSubcommand(ep.name, handler, doc, dist)
    return out


def _plugin_record(plugins: dict[str, dict], ep) -> dict:
    dist = getattr(getattr(ep, "dist", None), "name", None) or "<unknown>"
    return plugins.setdefault(dist, {
        "distribution": dist,
        "modules": [], "operations": [], "data_types": [],
        "cli_subcommands": [], "errors": [],
    })


def _register_operation_obj(context: "KiaraContext", obj: Any, rec: dict) -> None:
    from .operations import Operation

    if callable(obj) and not isinstance(obj, Operation):
        obj = obj()
    ops = [obj] if isinstance(obj, Operation) else list(obj)
    for op in ops:
        if not isinstance(op, Operation):
            raise TypeError(f"expected Operation, got {type(op).__name__}")
        context.operation_registry.register(op)
        rec["operations"].append(op.operation_id)


def discover_entry_point_plugins(context: "KiaraContext") -> dict[str, dict]:
    """Load every ``kiara_spark.*`` entry point into the context's
    registries; returns {distribution_name: plugin_info} for the API's
    plugin surface.  Never raises for a faulty plugin."""
    from importlib.metadata import entry_points

    from .datatypes import DataType
    from .modules import KiaraModule
    from .operations import Operation

    plugins: dict[str, dict] = {}

    for ep in entry_points(group="kiara_spark.modules"):
        rec = _plugin_record(plugins, ep)
        try:
            cls = ep.load()
            if not (isinstance(cls, type) and issubclass(cls, KiaraModule)):
                raise TypeError(f"{ep.value} is not a KiaraModule subclass")
            if "_module_type_name" not in cls.__dict__:
                # class declares no id of its own (the base default would
                # apply): the entry point name IS the module id, like the
                # reference, where the pyproject key names the module
                cls._module_type_name = ep.name
            context.module_registry.register(cls)
            mt = cls._module_type_name
            # mint the default same-named operation (CustomModuleOperationType)
            if mt not in context.operation_registry.operation_ids:
                doc = (cls.__doc__ or "").strip().split("\n")[0]
                context.operation_registry.register(Operation(mt, mt, doc=doc))
            rec["modules"].append(mt)
        except Exception as exc:  # noqa: BLE001 — isolate faulty plugins
            rec["errors"].append(f"modules:{ep.name}: {exc}")

    for ep in entry_points(group="kiara_spark.data_types"):
        rec = _plugin_record(plugins, ep)
        try:
            cls = ep.load()
            if not (isinstance(cls, type) and issubclass(cls, DataType)):
                raise TypeError(f"{ep.value} is not a DataType subclass")
            if getattr(cls, "name", None) in (None, DataType.name):
                cls.name = ep.name
            context.type_registry.register(cls)
            rec["data_types"].append(cls.name)
        except Exception as exc:  # noqa: BLE001
            rec["errors"].append(f"data_types:{ep.name}: {exc}")

    for ep in entry_points(group="kiara_spark.operations"):
        rec = _plugin_record(plugins, ep)
        try:
            _register_operation_obj(context, ep.load(), rec)
        except Exception as exc:  # noqa: BLE001
            rec["errors"].append(f"operations:{ep.name}: {exc}")

    for ep in entry_points(group="kiara_spark.cli_subcommands"):
        # dispatch happens CLI-side (find_cli_subcommands); here the entry
        # point is only validated and surfaced in the plugin info
        rec = _plugin_record(plugins, ep)
        try:
            if not callable(ep.load()):
                raise TypeError(f"{ep.value} is not callable")
            rec["cli_subcommands"].append(ep.name)
        except Exception as exc:  # noqa: BLE001
            rec["errors"].append(f"cli_subcommands:{ep.name}: {exc}")

    for ep in entry_points(group="kiara_spark.plugin"):
        rec = _plugin_record(plugins, ep)
        try:
            hook = ep.load()
            before_ops = set(context.operation_registry.operation_ids)
            before_mods = set(context.module_registry.module_type_names)
            hook(context)
            rec["operations"].extend(
                sorted(set(context.operation_registry.operation_ids) - before_ops))
            rec["modules"].extend(
                sorted(set(context.module_registry.module_type_names) - before_mods))
        except Exception as exc:  # noqa: BLE001
            rec["errors"].append(f"plugin:{ep.name}: {exc}")

    return plugins
