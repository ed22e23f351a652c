"""URDF rig-extrinsics parsing with golden values (reference: camera/utils.py:101-178)."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from thor_slam_tpu.camera.utils import load_rig_extrinsics_from_urdf, parse_urdf_transform

RIG_URDF = """<?xml version="1.0"?>
<robot name="test_rig">
  <link name="base_link"/>
  <link name="link_Camera_1"/>
  <link name="link_Camera_2"/>
  <link name="link_orphan"/>
  <joint name="j1" type="fixed">
    <parent link="base_link"/>
    <child link="link_Camera_1"/>
    <origin xyz="1.0 0.5 0.25" rpy="0 0 0"/>
  </joint>
  <joint name="j2" type="fixed">
    <parent link="base_link"/>
    <child link="link_Camera_2"/>
    <origin xyz="0.1 -0.2 0.3" rpy="0.1 -0.4 1.2"/>
  </joint>
  <joint name="j_orphan" type="fixed">
    <parent link="link_Camera_1"/>
    <child link="link_orphan"/>
    <origin xyz="9 9 9" rpy="0 0 0"/>
  </joint>
</robot>
"""


@pytest.fixture
def urdf_file(tmp_path):
    p = tmp_path / "rig.urdf"
    p.write_text(RIG_URDF)
    return p


class TestParseTransform:
    def test_translation_only(self):
        """The reference's own TODO asks exactly this check (utils.py:99-100)."""
        joint = ET.fromstring(
            '<joint name="j"><origin xyz="1.0 0.5 0.25" rpy="0 0 0"/></joint>'
        )
        t = parse_urdf_transform(joint)
        np.testing.assert_allclose(t[:3, 3], [1.0, 0.5, 0.25])
        np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-12)

    def test_rpy_matches_scipy_extrinsic_xyz(self):
        joint = ET.fromstring('<joint name="j"><origin xyz="0 0 0" rpy="0.3 -0.7 2.1"/></joint>')
        t = parse_urdf_transform(joint)
        # URDF-spec extrinsic rpy == scipy lowercase 'xyz' (the reference's
        # uppercase 'XYZ' call is intrinsic — a deviation from its own docs).
        expected = R.from_euler("xyz", [0.3, -0.7, 2.1]).as_matrix()
        np.testing.assert_allclose(t[:3, :3], expected, atol=1e-12)

    def test_missing_origin_is_identity(self):
        joint = ET.fromstring('<joint name="j"></joint>')
        np.testing.assert_array_equal(parse_urdf_transform(joint), np.eye(4))

    def test_defaults_when_attrs_missing(self):
        joint = ET.fromstring('<joint name="j"><origin xyz="1 2 3"/></joint>')
        t = parse_urdf_transform(joint)
        np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(t[:3, 3], [1, 2, 3])

    def test_yaw_90(self):
        joint = ET.fromstring(
            f'<joint name="j"><origin xyz="0 0 0" rpy="0 0 {np.pi / 2}"/></joint>'
        )
        t = parse_urdf_transform(joint)
        # +x axis rotates to +y under yaw 90.
        np.testing.assert_allclose(t[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)


class TestLoadRigExtrinsics:
    def test_star_topology(self, urdf_file):
        out = load_rig_extrinsics_from_urdf(
            urdf_file, {"192.168.2.21": "link_Camera_1", "192.168.2.22": "link_Camera_2"}
        )
        assert set(out) == {"192.168.2.21", "192.168.2.22"}
        np.testing.assert_allclose(out["192.168.2.21"].translation, [1.0, 0.5, 0.25])
        expected_rot = R.from_euler("xyz", [0.1, -0.4, 1.2]).as_matrix()
        np.testing.assert_allclose(out["192.168.2.22"].rotation, expected_rot, atol=1e-12)

    def test_non_base_link_parent_skipped(self, urdf_file):
        out = load_rig_extrinsics_from_urdf(urdf_file, {"x": "link_orphan"})
        assert out == {}

    def test_missing_link_warns_not_raises(self, urdf_file):
        out = load_rig_extrinsics_from_urdf(urdf_file, {"x": "no_such_link"})
        assert out == {}

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_rig_extrinsics_from_urdf(tmp_path / "nope.urdf", {})


class TestPromptForResolution:
    """Interactive resolution menu (reference camera/utils.py:55-96)."""

    CHOICES = [(640, 400), (1280, 720), (1920, 1080)]

    def _prompt(self, answers):
        from thor_slam_tpu.camera.utils import prompt_for_resolution

        it = iter(answers)
        return prompt_for_resolution(self.CHOICES, input_fn=lambda _: next(it))

    def test_picks_by_index(self):
        assert self._prompt(["1"]) == (1280, 720)

    def test_rejects_garbage_then_accepts(self):
        assert self._prompt(["abc", "99", "0"]) == (640, 400)

    def test_quit_returns_none(self):
        assert self._prompt(["q"]) is None

    def test_empty_input_aborts(self):
        assert self._prompt([""]) is None

    def test_eof_returns_none(self):
        from thor_slam_tpu.camera.utils import prompt_for_resolution

        def raise_eof(_):
            raise EOFError

        assert prompt_for_resolution(self.CHOICES, input_fn=raise_eof) is None

    def test_empty_choices(self):
        from thor_slam_tpu.camera.utils import prompt_for_resolution

        assert prompt_for_resolution([], input_fn=lambda _: "0") is None
