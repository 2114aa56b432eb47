"""Asset ingestion: FBX (ASCII + binary) and OBJ loaders.

The reference ingests FBX via XNA's ModelImporter + TracerModelProcessor at
build time (TracerModelProcessor.cs:105-242); our loaders parse the files
directly.  The convention check is central: the framework's face normal is
the reference's ``normalize(cross(e2, e1))`` (TracerModelProcessor.cs:199-
203) on XNA's CW-front triangles, so both loaders flip the CCW-front source
winding — a loaded closed mesh must have ``cross(e2, e1)`` agreeing with its
authored outward vertex normals.
"""

import os
import textwrap

import numpy as np
import pytest

from raytpu.scene.fbx_loader import load_fbx, parse_fbx
from raytpu.scene.obj_loader import load_obj
from raytpu.scene.types import Material

REF_CONTENT = "/root/reference/RayTraceProject/RayTraceProjectContent"

# A minimal FBX 6100 ASCII document: one unit quad (two triangles after fan
# triangulation) with per-vertex normals (+z) and UVs, translated by (0,0,2).
ASCII_QUAD = textwrap.dedent("""\
    ; FBX 6.1.0 project file
    FBXHeaderExtension:  {
        FBXVersion: 6100
    }
    Objects:  {
        Model: "Model::quad", "Mesh" {
            Version: 232
            Properties60:  {
                Property: "Lcl Translation", "Lcl Translation", "A+",0,0,2
                Property: "Lcl Rotation", "Lcl Rotation", "A+",0,0,0
                Property: "Lcl Scaling", "Lcl Scaling", "A+",1,1,1
            }
            Vertices: -1,-1,0,1,-1,0,1,1,0,-1,1,0
            PolygonVertexIndex: 0,1,2,-4
            LayerElementNormal: 0 {
                Version: 101
                Name: ""
                MappingInformationType: "ByVertice"
                ReferenceInformationType: "Direct"
                Normals: 0,0,1,0,0,1,0,0,1,0,0,1
            }
            LayerElementUV: 0 {
                Version: 101
                Name: "UVMap"
                MappingInformationType: "ByPolygonVertex"
                ReferenceInformationType: "IndexToDirect"
                UV: 0,0,1,0,1,1,0,1
                UVIndex: 0,1,2,3
            }
        }
    }
    Connections:  {
        Connect: "OO", "Model::quad", "Model::Scene"
    }
    """)


def _winding_agreement(mesh):
    """Fraction of triangles whose cross(e2,e1) face normal agrees with the
    authored vertex normals."""
    v = np.asarray(mesh.vertices)
    n = np.asarray(mesh.normals)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    fn = np.cross(e2, e1)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-30)
    return (np.sum(fn * n.mean(axis=1), axis=-1) > 0).mean()


class TestFbxAscii:
    @pytest.fixture()
    def quad_path(self, tmp_path):
        p = tmp_path / "quad.fbx"
        p.write_text(ASCII_QUAD)
        return str(p)

    def test_parse_tree(self, quad_path):
        root = parse_fbx(quad_path)
        objects = root.find("Objects")
        assert objects is not None
        model = objects.find("Model")
        assert model.props[0] == "Model::quad"

    def test_geometry_and_transform(self, quad_path):
        meshes = load_fbx(quad_path)
        assert len(meshes) == 1
        m = meshes[0]
        assert m.num_triangles == 2
        v = np.asarray(m.vertices)
        # Quad translated to z=2 by the Lcl Translation.
        np.testing.assert_allclose(v[..., 2], 2.0)
        assert v[..., 0].min() == -1.0 and v[..., 0].max() == 1.0

    def test_winding_flipped_to_reference_convention(self, quad_path):
        m = load_fbx(quad_path)[0]
        assert _winding_agreement(m) == 1.0
        # cross(e2, e1) must equal the authored +z normal.
        v = np.asarray(m.vertices)
        fn = np.cross(v[:, 2] - v[:, 0], v[:, 1] - v[:, 0])
        assert (fn[:, 2] > 0).all()

    def test_uvs_v_flipped(self, quad_path):
        m = load_fbx(quad_path)[0]
        assert m.uvs is not None
        uv = np.asarray(m.uvs)
        # Source UVs span [0,1]^2; V flipped to texture top-down space.
        assert uv.min() >= 0.0 and uv.max() <= 1.0
        # Corner (-1,-1) had uv (0,0) -> flipped to (0,1).
        v = np.asarray(m.vertices)
        corner = np.isclose(v[..., 0], -1) & np.isclose(v[..., 1], -1)
        assert np.allclose(uv[corner], [0.0, 1.0])

    def test_material_shared(self, quad_path):
        mat = Material(reflectiveness=0.7)
        meshes = load_fbx(quad_path, material=mat)
        assert meshes[0].material is mat


class TestObjLoader:
    def test_quad_winding_and_uv(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text(
            "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
            "vn 0 0 1\n"
            "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
        )
        m = load_obj(str(p))
        assert m.num_triangles == 2
        assert _winding_agreement(m) == 1.0


needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_CONTENT), reason="reference assets not present"
)


@needs_ref
class TestReferenceAssets:
    """The reference's own content must load (parity with its asset set)."""

    @pytest.mark.parametrize(
        "name,tris",
        [
            ("cube.fbx", 12),            # ASCII 6100
            ("Sphere.fbx", 960),
            ("monkey.fbx", 968),
            ("torus.fbx", 1152),
            ("Android.FBX", 7400),       # binary 6000
            ("dna_exported_from_max2011.FBX", 69120),  # binary 7100 (Max)
        ],
    )
    def test_loads_with_expected_triangle_count(self, name, tris):
        meshes = load_fbx(os.path.join(REF_CONTENT, name))
        assert sum(m.num_triangles for m in meshes) == tris

    def test_closed_mesh_winding_outward(self):
        m = load_fbx(os.path.join(REF_CONTENT, "monkey.fbx"))[0]
        assert _winding_agreement(m) > 0.95
