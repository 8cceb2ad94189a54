"""Root conftest: make the pyproject `addopts = "-n 4"` (pytest-xdist)
degrade gracefully. On machines without xdist a bare `pytest` would abort
with "unrecognized arguments: -n" before collecting anything; this hook
strips the flag so the suite still runs (slower, single-process).

Runs at rootdir before option parsing (pytest_load_initial_conftests is
only honored in rootdir conftests/plugins).
"""


def pytest_load_initial_conftests(args, early_config, parser):
    try:
        import xdist  # noqa: F401
    except ImportError:
        while "-n" in args:
            i = args.index("-n")
            del args[i : i + 2]
