"""Config round-trip: save, format, and starter-template generation.

Parity with the reference's config management surface
(``/root/reference/config/loader.py:61-82`` save_config /
format_config_yaml, ``:130-147`` generate_template): load is in
``plans/compiler.load_config``; this module adds the write side.

Comment preservation: when ruamel.yaml is importable, ``load_config_rt``
returns a round-trip document whose comments/quotes/order survive
``save_config``. Without ruamel (this container ships only PyYAML) the
fallback writes plain block-style YAML — keys and values round-trip,
comments do not. JSON configs round-trip via the stdlib either way.
"""

from __future__ import annotations

import json
from typing import Any

try:
    from ruamel.yaml import YAML

    _ruamel = YAML()
    _ruamel.default_flow_style = False
    _ruamel.allow_unicode = True
    _ruamel.indent(mapping=2, sequence=4, offset=2)
    _ruamel.preserve_quotes = True
except ImportError:  # PyYAML fallback — values round-trip, comments don't
    _ruamel = None

_YAML_SUFFIXES = (".yaml", ".yml")


def load_config_rt(path: str) -> Any:
    """Load a config preserving as much document structure as the
    available YAML library allows (ruamel: comments/quotes/order;
    PyYAML: plain dicts). JSON loads via the stdlib."""
    if not path.endswith((".json",) + _YAML_SUFFIXES):
        raise ValueError(f"unsupported config format: {path} (use .yaml/.yml/.json)")
    text = open(path, encoding="utf-8").read()
    if path.endswith(".json"):
        return json.loads(text)
    if _ruamel is not None:
        return _ruamel.load(text) or {}
    import yaml

    return yaml.safe_load(text) or {}


def format_config_yaml(config: dict) -> str:
    """Config dict -> display-ready YAML string."""
    if _ruamel is not None:
        from io import StringIO

        buf = StringIO()
        _ruamel.dump(config, buf)
        return buf.getvalue()
    import yaml

    return yaml.safe_dump(config, default_flow_style=False, allow_unicode=True, sort_keys=False)


def save_config(config: dict, path: str) -> None:
    """Write a config to .yaml/.yml/.json. A ruamel round-trip document
    (from ``load_config_rt``) keeps its comments; plain dicts get
    formatted block YAML / indented JSON."""
    if not isinstance(config, dict):
        raise ValueError("config must be a dict")
    if path.endswith(_YAML_SUFFIXES):
        with open(path, "w", encoding="utf-8") as f:
            if _ruamel is not None:
                _ruamel.dump(config, f)
            else:
                import yaml

                yaml.safe_dump(
                    config, f, default_flow_style=False, allow_unicode=True, sort_keys=False
                )
        return
    if path.endswith(".json"):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(config, f, ensure_ascii=False, indent=2)
        return
    raise ValueError(f"unsupported config format: {path} (use .yaml/.yml/.json)")


def generate_template(path: str) -> dict:
    """Write a starter rule config demonstrating the grammar the
    compiler accepts (both nested-``rules`` and flat pattern keys work;
    the template uses the explicit nested form). Returns the dict."""
    template = {
        "rules": {
            "**/*.txt": {
                "processors": ["count_lines", {"name": "extract_numbers", "config": {"column": "value"}}],
                "priority": 10,
            },
            "data/**/*.csv": {
                "processors": ["csv_stats"],
                "pre_processors": ["strip_header"],
                "priority": 5,
            },
            "**/*.log": {"processors": ["analyze_log"]},
        },
        "pre_process": ["setup"],
        "post_process": ["report"],
    }
    save_config(template, path)
    return template
