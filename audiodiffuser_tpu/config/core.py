"""Hydra-style configuration system (self-contained, no hydra dependency).

Reproduces the config semantics the reference relies on
(``/root/reference/configs/**``, hydra 1.3):

- **config groups**: a root config (``train.yaml``) declares a ``defaults``
  list; each entry ``group: name`` merges ``configs/<group>/<name>.yaml``
  under key ``group``.
- **experiment overlays**: ``experiment=<path>`` loads
  ``configs/experiment/<path>.yaml`` as a ``# @package _global_`` overlay: its
  own ``defaults`` entries of the form ``override /group: name`` swap whole
  groups, and its remaining keys deep-merge into the root.
- **interpolation**: ``${a.b.c}`` references resolve after the full merge.
- **CLI overrides**: ``key.sub=value`` (typed via YAML), ``+key=value`` to
  add new keys, ``~key`` to delete.
- **multirun**: comma-separated values (``model.sampler.order=1,2,3``)
  expand to the cartesian product of jobs.
- **instantiation**: ``_target_: pkg.mod.Class`` nodes build objects
  recursively; ``_partial_: true`` returns a functools.partial.
"""

from __future__ import annotations

import functools
import importlib
import itertools
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


class Config(dict):
    """Nested dict with attribute access."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict) and not isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self):
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


class _ConfigLoader(yaml.SafeLoader):
    """SafeLoader with the extended float resolver (accepts '1e-4' etc.,
    which vanilla YAML 1.1 would read as a string)."""


_ConfigLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:
         [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            # an overlay that retargets a component replaces it wholesale —
            # merging stale kwargs of the old _target_ would mis-instantiate
            if "_target_" in v and v["_target_"] != out[k].get("_target_"):
                out[k] = v
            else:
                out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml(path: Path) -> dict:
    with open(path) as f:
        data = yaml.load(f, Loader=_ConfigLoader)
    return data or {}


def _is_global_package(path: Path) -> bool:
    """True when the file's first non-blank line is `# @package _global_`
    (hydra semantics: the group file merges at root, not under its group)."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            return line.replace(" ", "") == "#@package_global_"
    return False


def _compose_group(config_dir: Path, group: str, name: str):
    """Compose configs/<group>/<name>.yaml (following its in-group `defaults`
    list). Returns (group_dict, root_overlay, has_group): `group_dict` is the
    content destined for cfg[group]; `root_overlay` the content of any
    `# @package _global_` files in the chain, to deep-merge at root;
    `has_group` says whether a non-global file contributed (so an empty group
    file still *replaces* the group, hydra-style)."""
    path = _group_file(config_dir, group, str(name))
    sub = _load_yaml(path)
    gdict: dict = {}
    rootdict: dict = {}
    has_group = False
    for entry in sub.pop("defaults", []):
        if entry == "_self_":
            continue
        sibling = entry if isinstance(entry, str) else next(iter(entry.values()))
        g2, r2, h2 = _compose_group(config_dir, group, _strip_ext(str(sibling)))
        gdict = _deep_merge(gdict, g2)
        rootdict = _deep_merge(rootdict, r2)
        has_group = has_group or h2
    if _is_global_package(path):
        rootdict = _deep_merge(rootdict, sub)
    else:
        gdict = _deep_merge(gdict, sub)
        has_group = True
    return gdict, rootdict, has_group


def _strip_ext(name: str) -> str:
    return name[:-5] if name.endswith(".yaml") else name


def _group_file(config_dir: Path, group: str, name: str) -> Path:
    return config_dir / group / f"{_strip_ext(name)}.yaml"


def _apply_defaults(config_dir: Path, cfg: dict, defaults: List) -> dict:
    """Merge a root config's defaults list (in order)."""
    merged: dict = {}
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, cfg)
            continue
        if isinstance(entry, str):
            continue  # e.g. bare names we don't support yet
        ((group, name),) = entry.items()
        group = str(group)
        if name is None:
            continue
        if group.startswith("optional "):
            group = group[len("optional "):]
            path = _group_file(config_dir, group, str(name))
            if not path.exists():
                continue
        if group == "experiment":
            # handled separately, after base groups
            continue
        gdict, rootdict, has_group = _compose_group(config_dir, group, str(name))
        if has_group:
            merged = _deep_merge(merged, {group: gdict})
        merged = _deep_merge(merged, rootdict)
    if "_self_" not in defaults:
        merged = _deep_merge(merged, cfg)
    return merged


def _apply_experiment(config_dir: Path, cfg: dict, exp_name: str) -> dict:
    """Apply a `# @package _global_` experiment overlay."""
    path = config_dir / "experiment" / f"{_strip_ext(exp_name)}.yaml"
    overlay = _load_yaml(path)
    for entry in overlay.pop("defaults", []):
        if entry == "_self_" or isinstance(entry, str):
            continue
        ((key, name),) = entry.items()
        key = str(key)
        if key.startswith("override "):
            key = key[len("override "):]
        group = key.lstrip("/")
        if name is None:
            continue
        gdict, rootdict, has_group = _compose_group(config_dir, group, str(name))
        if has_group:
            cfg[group] = gdict  # full group replacement, matching hydra override
        cfg = _deep_merge(cfg, rootdict)
    return _deep_merge(cfg, overlay)


_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


def _resolve_path(cfg: dict, dotted: str):
    node: Any = cfg
    for part in dotted.split("."):
        if isinstance(node, dict) and part in node:
            node = node[part]
        else:
            raise KeyError(f"interpolation '${{{dotted}}}' not found")
    return node


def _resolve_interp(cfg: dict, max_passes: int = 10) -> dict:
    """Resolve ${a.b} references anywhere in the tree."""

    def resolve_value(v, root):
        if isinstance(v, str):
            full = _INTERP_RE.fullmatch(v.strip())
            if full:
                return _resolve_path(root, full.group(1))
            def sub(m):
                return str(_resolve_path(root, m.group(1)))
            return _INTERP_RE.sub(sub, v)
        return v

    def walk(node, root):
        if isinstance(node, dict):
            return {k: walk(v, root) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, root) for v in node]
        return resolve_value(node, root)

    for _ in range(max_passes):
        new = walk(cfg, cfg)
        if new == cfg:
            return new
        cfg = new
    return cfg


def _parse_override_value(text: str):
    return yaml.load(text, Loader=_ConfigLoader)


def _walk_dotted(cfg: dict, dotted: str):
    """Resolve a dotted path to (parent, final_key); a remaining suffix that
    exists verbatim as a literal dotted key is accepted (search-space specs
    use keys like 'data.batch_size')."""
    parts = dotted.split(".")
    node = cfg
    for i, p in enumerate(parts[:-1]):
        rest = ".".join(parts[i:])
        if isinstance(node, dict) and rest in node:
            return node, rest
        if not isinstance(node, dict) or p not in node:
            return node, None
        node = node[p]
    return node, parts[-1]


def _set_dotted(cfg: dict, dotted: str, value, allow_new: bool):
    parts = dotted.split(".")
    node = cfg
    for i, p in enumerate(parts[:-1]):
        rest = ".".join(parts[i:])
        if isinstance(node, dict) and rest in node:
            node[rest] = value
            return
        if p not in node or not isinstance(node[p], dict):
            if allow_new:
                node[p] = {}
            else:
                raise KeyError(
                    f"override key '{dotted}' not in config (use +{dotted}= to add)"
                )
        node = node[p]
    if not allow_new and parts[-1] not in node:
        raise KeyError(
            f"override key '{dotted}' not in config (use +{dotted}= to add)"
        )
    node[parts[-1]] = value


def _del_dotted(cfg: dict, dotted: str):
    parent, key = _walk_dotted(cfg, dotted)
    if isinstance(parent, dict) and key is not None:
        parent.pop(key, None)


def compose(
    config_dir: str,
    config_name: str = "train",
    overrides: Optional[Sequence[str]] = None,
) -> Config:
    """Compose a config like hydra.main would, returning a Config."""
    config_dir = Path(config_dir)
    overrides = list(overrides or [])

    root = _load_yaml(config_dir / f"{_strip_ext(config_name)}.yaml")
    defaults = root.pop("defaults", [])
    cfg = _apply_defaults(config_dir, root, defaults)

    # experiment selection: from defaults list or CLI
    exp = None
    for entry in defaults:
        if isinstance(entry, dict) and "experiment" in entry:
            exp = entry["experiment"]
        elif isinstance(entry, dict) and "optional experiment" in entry:
            exp = entry["optional experiment"]
    remaining = []
    for ov in overrides:
        if ov.startswith("experiment="):
            exp = ov.split("=", 1)[1]
        else:
            remaining.append(ov)
    if exp:
        cfg = _apply_experiment(config_dir, cfg, str(exp))

    # group overrides like data=sc09 (replace whole group)
    cli = []
    for ov in remaining:
        if "=" in ov:
            key, val = ov.split("=", 1)
            bare = key.lstrip("+~")
            if (
                "." not in bare
                and not key.startswith(("+", "~"))
                and (config_dir / bare).is_dir()
            ):
                gdict, rootdict, has_group = _compose_group(config_dir, bare, val)
                if has_group:
                    cfg[bare] = gdict  # whole-group replacement (hydra)
                cfg = _deep_merge(cfg, rootdict)
                continue
        cli.append(ov)

    for ov in cli:
        if ov.startswith("~"):
            _del_dotted(cfg, ov[1:])
            continue
        key, val = ov.split("=", 1)
        allow_new = key.startswith("+")
        key = key.lstrip("+")
        _set_dotted(cfg, key, _parse_override_value(val), allow_new)

    cfg = _resolve_interp(cfg)
    return Config.wrap(cfg)


def expand_multirun(overrides: Sequence[str]) -> List[List[str]]:
    """Expand comma-separated override values into a job grid."""
    axes: List[List[str]] = []
    for ov in overrides:
        if "=" in ov and not ov.startswith("~"):
            key, val = ov.split("=", 1)
            # don't split values that are YAML lists like [1,2]
            if "," in val and not val.strip().startswith(("[", "{")):
                axes.append([f"{key}={v}" for v in val.split(",")])
                continue
        axes.append([ov])
    return [list(combo) for combo in itertools.product(*axes)]


def _locate(target: str):
    module_name, _, attr = target.rpartition(".")
    mod = importlib.import_module(module_name)
    return getattr(mod, attr)


def instantiate(node: Any, **kwargs):
    """Recursively build objects from ``_target_`` nodes."""
    if isinstance(node, (list, tuple)):
        return [instantiate(v) for v in node]
    if not isinstance(node, dict):
        return node
    node = dict(node)
    target = node.pop("_target_", None)
    partial = node.pop("_partial_", False)
    built = {}
    for k, v in node.items():
        if k == "dtype" and isinstance(v, str):
            import numpy as _np

            built[k] = _np.dtype(v)  # 'bfloat16' etc. via ml_dtypes
            continue
        if isinstance(v, dict) and "_target_" in v:
            built[k] = instantiate(v)
        elif isinstance(v, dict):
            built[k] = Config.wrap(v)
        elif isinstance(v, list):
            built[k] = [instantiate(i) if isinstance(i, dict) and "_target_" in i else i for i in v]
        else:
            built[k] = v
    built.update(kwargs)
    if target is None:
        return Config.wrap(built)
    cls = _locate(target)
    if partial:
        return functools.partial(cls, **built)
    return cls(**built)
