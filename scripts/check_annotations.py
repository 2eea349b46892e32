"""Annotation-resolution gate: every type annotation in the package must
evaluate.

The reference CI runs the ``ty`` typechecker before pytest
(``/root/reference/.github/workflows/unittest.yml:26-34``); this repo's CI
does too, but ``ty`` cannot be installed in the zero-egress build
environment, so this script provides the locally-runnable half of the
gate: import every module under ``pytdscf_tpu`` and force-resolve every
function/method/class annotation via ``typing.get_type_hints``.  Catches
dangling names in string annotations, modules that fail to import, and
annotations referencing symbols dropped by refactors.

Run:  python scripts/check_annotations.py
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
import typing

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def _check_callable(fn, where: str, errors: list[str]) -> None:
    try:
        typing.get_type_hints(fn)
    except Exception as exc:  # noqa: BLE001 - report, don't crash
        errors.append(f"{where}: {type(exc).__name__}: {exc}")


def main() -> int:
    import pytdscf_tpu

    errors: list[str] = []
    n_mod = n_fn = 0
    for info in pkgutil.walk_packages(
        pytdscf_tpu.__path__, prefix="pytdscf_tpu."
    ):
        try:
            mod = importlib.import_module(info.name)
        except ImportError as exc:
            if "PyInit" in str(exc):
                # ctypes-loaded shared object (native/libprimints.so) —
                # not a Python extension module; nothing to typecheck
                continue
            errors.append(f"{info.name}: import failed: {exc}")
            continue
        except Exception as exc:  # noqa: BLE001
            errors.append(f"{info.name}: import failed: {exc}")
            continue
        n_mod += 1
        for name, obj in vars(mod).items():
            if getattr(obj, "__module__", None) != info.name:
                continue
            if inspect.isfunction(obj):
                n_fn += 1
                _check_callable(obj, f"{info.name}.{name}", errors)
            elif inspect.isclass(obj):
                try:
                    typing.get_type_hints(obj)
                except Exception as exc:  # noqa: BLE001
                    errors.append(
                        f"{info.name}.{name}: {type(exc).__name__}: {exc}"
                    )
                for mname, meth in vars(obj).items():
                    if inspect.isfunction(meth):
                        n_fn += 1
                        _check_callable(
                            meth, f"{info.name}.{name}.{mname}", errors
                        )
    print(f"checked {n_fn} callables across {n_mod} modules")
    if errors:
        print(f"{len(errors)} annotation failures:")
        for e in errors:
            print(f"  {e}")
        return 1
    print("all annotations resolve")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
