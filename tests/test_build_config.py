"""Build-config helpers (model: the reference's build_config package —
root discovery, toolchain probing, env-driven args, external build driver)."""

import os
import subprocess

import pytest

from accvlab_tpu.build_config import (
    build_cmake_args,
    find_repo_root,
    get_package_version,
    probe_cxx_flag,
    run_external_build,
    select_cxx_flags,
)


def test_find_repo_root_from_package():
    root = find_repo_root()
    assert root is not None
    assert os.path.exists(os.path.join(root, "pyproject.toml"))


def test_find_repo_root_none_outside(tmp_path):
    # a bare temp dir with no markers anywhere up to / (tmp dirs usually
    # have none, but guard against a marker-bearing ancestor)
    result = find_repo_root(str(tmp_path))
    if result is not None:
        assert any(
            os.path.exists(os.path.join(result, m))
            for m in (".accvlab-root", "pyproject.toml", ".git")
        )


def test_version_forwarding():
    v = get_package_version()
    assert isinstance(v, str) and v[0].isdigit()


def test_probe_cxx_flag():
    assert probe_cxx_flag("-O2")
    assert not probe_cxx_flag("--definitely-not-a-flag-xyz")


def test_select_cxx_flags_default_and_env(monkeypatch):
    flags = select_cxx_flags()
    assert "-O3" in flags and "-std=c++17" in flags
    monkeypatch.setenv("ACCVLAB_CXXFLAGS", "-O1 -DFOO=1")
    assert select_cxx_flags() == ["-O1", "-DFOO=1"]


def test_build_cmake_args_env(monkeypatch):
    monkeypatch.setenv("ACCVLAB_CMAKE_BUILD_TYPE", "Debug")
    monkeypatch.setenv("ACCVLAB_CMAKE_ARGS", "-DBAR=2")
    args = build_cmake_args()
    assert "-DCMAKE_BUILD_TYPE=Debug" in args
    assert "-DBAR=2" in args
    assert any(a.startswith("-DACCVLAB_VERSION=") for a in args)


def test_run_external_build_direct_gpp(tmp_path):
    csrc = tmp_path / "csrc"
    csrc.mkdir()
    (csrc / "hello.cpp").write_text(
        'extern "C" int accvlab_hello() { return 42; }\n'
    )
    lib = run_external_build(str(csrc), "libhello")
    assert os.path.exists(lib)
    import ctypes

    assert ctypes.CDLL(lib).accvlab_hello() == 42
    # rebuild is a cache hit (same path), edit changes the key
    assert run_external_build(str(csrc), "libhello") == lib
    (csrc / "hello.cpp").write_text(
        'extern "C" int accvlab_hello() { return 43; }\n'
    )
    lib2 = run_external_build(str(csrc), "libhello")
    assert lib2 != lib


@pytest.mark.skipif(
    subprocess.run(["which", "cmake"], capture_output=True).returncode != 0,
    reason="cmake not available",
)
def test_run_external_build_cmake(tmp_path):
    csrc = tmp_path / "csrc"
    csrc.mkdir()
    (csrc / "lib.cpp").write_text('extern "C" int accvlab_cm() { return 7; }\n')
    (csrc / "CMakeLists.txt").write_text(
        "cmake_minimum_required(VERSION 3.16)\n"
        "project(accvlab_cm_test CXX)\n"
        "add_library(accvlab_cm SHARED lib.cpp)\n"
    )
    lib = run_external_build(str(csrc), "libaccvlab_cm")
    import ctypes

    assert ctypes.CDLL(lib).accvlab_cm() == 7
