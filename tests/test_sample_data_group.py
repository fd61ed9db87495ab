"""SampleDataGroup tests (model: reference
tests/pipeline/sample_data_group_functionality_test.py)."""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, SampleDataGroup


def make_blueprint():
    cam = SampleDataGroup()
    cam.add_data_field("image", DType.UINT8)
    cam.add_data_field("num_boxes", DType.INT32)
    ann = SampleDataGroup()
    ann.add_data_field("bounding_boxes", DType.FLOAT)
    ann.add_data_field("labels", DType.INT32, mapping={"car": 0, "person": 1, None: -1})
    cam.add_data_group_field("annotations", ann)
    root = SampleDataGroup()
    root.add_data_group_field_array("cameras", cam, 2)
    root.add_data_field("token", DType.STRING)
    return root


def test_structure_and_access():
    sdg = make_blueprint()
    assert len(sdg) == 2
    assert sdg.has_child("cameras")
    assert sdg["cameras"].is_data_group_field_array()
    sdg["cameras"][0]["image"] = np.zeros((4, 6, 3))
    assert sdg["cameras"][0]["image"].dtype == np.uint8


def test_conversion_on_assignment():
    sdg = make_blueprint()
    sdg["cameras"][0]["num_boxes"] = 3.0  # float -> int32 conversion
    assert sdg["cameras"][0]["num_boxes"].dtype == np.int32


def test_mapping():
    sdg = make_blueprint()
    ann = sdg["cameras"][1]["annotations"]
    ann["labels"] = "person"
    assert int(ann["labels"]) == 1
    ann["labels"] = None
    assert int(ann["labels"]) == -1
    with pytest.raises(KeyError):
        ann["labels"] = "bicycle"


def test_string_roundtrip():
    sdg = make_blueprint()
    sdg["token"] = "sample_0042"
    assert sdg["token"] == "sample_0042"
    # underlying storage is a uint8 tensor
    raw = sdg.get_data()[-1]
    assert raw.dtype == np.uint8


def test_flat_names_and_types():
    sdg = make_blueprint()
    names = sdg.field_names_flat
    assert names == (
        "cameras.[0].image",
        "cameras.[0].num_boxes",
        "cameras.[0].annotations.bounding_boxes",
        "cameras.[0].annotations.labels",
        "cameras.[1].image",
        "cameras.[1].num_boxes",
        "cameras.[1].annotations.bounding_boxes",
        "cameras.[1].annotations.labels",
        "token",
    )
    types = sdg.field_types_flat
    assert types[0] == DType.UINT8
    assert types[-1] == DType.UINT8  # STRING reported as UINT8


def test_get_set_data_roundtrip():
    sdg = make_blueprint()
    sdg["cameras"][0]["image"] = np.ones((2, 2, 3))
    sdg["token"] = "abc"
    flat = sdg.get_data()
    assert len(flat) == 9

    other = make_blueprint()
    other.set_data(flat)
    np.testing.assert_array_equal(
        other["cameras"][0]["image"], sdg["cameras"][0]["image"]
    )
    assert other["token"] == "abc"


def test_type_matches():
    a, b = make_blueprint(), make_blueprint()
    assert a.type_matches(b)
    b.remove_field("token")
    assert not a.type_matches(b)


def test_path_access():
    sdg = make_blueprint()
    sdg.set_item_in_path(("cameras", 0, "num_boxes"), 7)
    assert int(sdg.get_item_in_path(("cameras", 0, "num_boxes"))) == 7
    assert sdg.path_exists(("cameras", 1, "annotations"))
    assert not sdg.path_exists(("cameras", 2))
    assert sdg.path_exists_and_is_data_group_field(("cameras", 0, "annotations"))
    assert sdg.get_type_of_item_in_path(("cameras", 0, "image")) == DType.UINT8


def test_find_and_remove_occurrences():
    sdg = make_blueprint()
    occ = sdg.find_all_occurrences("image")
    assert occ == (("cameras", 0, "image"), ("cameras", 1, "image"))
    assert sdg.get_num_occurrences("annotations") == 2
    sdg.remove_all_occurrences("image")
    assert sdg.get_num_occurrences("image") == 0


def test_change_type():
    sdg = make_blueprint()
    cam0 = sdg["cameras"][0]
    cam0["image"] = np.zeros((2, 2))
    cam0.change_type_of_data_and_remove_data("image", DType.FLOAT)
    assert cam0.get_type_of_field("image") == DType.FLOAT
    assert cam0._values["image"] is None
    cam0["image"] = np.zeros((2, 2))
    assert cam0["image"].dtype == np.float32


def test_group_assignment_format_guard():
    sdg = make_blueprint()
    wrong = SampleDataGroup()
    wrong.add_data_field("x", DType.FLOAT)
    with pytest.raises(KeyError):
        sdg["cameras"] = wrong


def test_duplicate_field_rejected():
    sdg = SampleDataGroup()
    sdg.add_data_field("x", DType.FLOAT)
    with pytest.raises(AssertionError):
        sdg.add_data_field("x", DType.FLOAT)


def test_ensure_uniform_strings():
    sdg = SampleDataGroup()
    sdg.add_data_field("name", DType.STRING)
    sdg["name"] = "ab"
    # simulate a batch (list of per-sample byte tensors)
    sdg._values["name"] = [
        np.frombuffer(b"ab", np.uint8).copy(),
        np.frombuffer(b"defg", np.uint8).copy(),
    ]
    sdg.ensure_uniform_size_in_batch_for_all_strings()
    assert all(v.shape == (4,) for v in sdg._values["name"])
    assert SampleDataGroup._convert_to_string(sdg._values["name"][0]) == "ab"


def test_ensure_uniform_size():
    sdg = SampleDataGroup()
    sdg.add_data_field("boxes", DType.FLOAT)
    sdg._values["boxes"] = [np.ones((2, 4), np.float32), np.ones((5, 4), np.float32)]
    sdg.ensure_uniform_size_in_batch(fill_value=-1.0)
    assert all(v.shape == (5, 4) for v in sdg._values["boxes"])
    assert sdg._values["boxes"][0][3, 0] == -1.0


def test_traced_type_check():
    import jax.numpy as jnp

    sdg = SampleDataGroup()
    sdg.add_data_field("x", DType.FLOAT)
    sdg["x"] = jnp.zeros(3, jnp.float32)  # ok
    with pytest.raises(TypeError):
        sdg["x"] = jnp.zeros(3, jnp.int32)  # wrong dtype, traced -> check


def test_to_dictionary_and_str():
    sdg = make_blueprint()
    sdg["token"] = "xyz"
    d = sdg.to_dictionary()
    assert d["token"] == "xyz"
    assert "cameras" in d and 0 in d["cameras"]
    s = str(sdg)
    assert "token" in s and "STRING" in s


def test_blueprint_copy_independent():
    sdg = make_blueprint()
    bp = sdg.get_empty_like_self()
    assert bp.type_matches(sdg)
    bp["cameras"][0].remove_field("image")
    assert sdg["cameras"][0].has_child("image")


def test_get_like_self_filled_from_iterator_output():
    sdg = make_blueprint()
    sdg["cameras"][0]["image"] = np.ones((2, 2, 3))
    sdg["token"] = "xy"
    flat = sdg.get_data()
    keyed = [dict(zip(sdg.field_names_flat, flat))]
    filled = sdg.get_like_self_filled_from_iterator_output(keyed, 0)
    np.testing.assert_array_equal(
        filled["cameras"][0]["image"], sdg["cameras"][0]["image"]
    )
    assert filled["token"] == "xy"


@pytest.mark.parametrize("seed", range(10))
def test_random_blueprint_roundtrip(seed):
    """Random nested blueprints: fill every field, flatten, rebuild into a
    fresh blueprint copy, and compare — the invariant behind every pipeline
    boundary crossing."""
    rng = np.random.default_rng(seed)
    dtypes = [DType.FLOAT, DType.INT32, DType.UINT8, DType.BOOL, DType.STRING]

    counter = [0]

    def build(depth):
        sdg = SampleDataGroup()
        for i in range(int(rng.integers(1, 4))):
            if depth < 2 and rng.random() < 0.4:
                child = build(depth + 1)
                if rng.random() < 0.3:
                    sdg.add_data_group_field_array(f"arr{i}", child, int(rng.integers(1, 3)))
                else:
                    sdg.add_data_group_field(f"grp{i}", child)
            else:
                sdg.add_data_field(f"f{counter[0]}", dtypes[rng.integers(0, len(dtypes))])
                counter[0] += 1
        return sdg

    def fill(sdg):
        for name in sdg._value_order:
            if sdg._types[name] == SampleDataGroup:
                fill(sdg[name])
            elif sdg.get_type_of_field(name) == DType.STRING:
                sdg[name] = f"s{rng.integers(0, 100)}"
            else:
                shape = tuple(rng.integers(1, 4, rng.integers(1, 3)))
                sdg[name] = rng.integers(0, 2, shape).astype(np.float64)

    root = build(0)
    fill(root)
    flat = root.get_data()
    names = root.field_names_flat
    assert len(flat) == len(names) == len(set(names))

    other = root.get_empty_like_self()
    assert other.type_matches(root)
    other.set_data(list(flat))
    for a, b in zip(other.get_data(), flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
