"""Fracture-geometry mesh tooling (host-side, optional).

The reference (mlmc/random/frac_geom.py:1-139) builds fractured-domain
meshes through the external ``geomop`` package + gmsh binary; neither is
available in this environment and the capability is out of the TPU compute
scope (SURVEY.md §2: "out of scope for TPU core; keep as optional host
utility"). The functions are kept as a gated API: they raise a clear
ImportError describing the required external dependencies.
"""


def _require_geomop():
    try:
        import geomop  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "frac_geom requires the external 'geomop' package and the gmsh "
            "binary (reference mlmc/random/frac_geom.py:1-7); install them "
            "to build fractured-domain meshes") from e


def make_frac_mesh(box, mesh_step, fractures, frac_step):
    """Build a fractured-domain mesh (reference frac_geom.py:17-30)."""
    _require_geomop()
    raise NotImplementedError(
        "geomop present but mlmc_tpu bridge not implemented; "
        "use the reference tooling to produce the mesh, then load it "
        "with mlmc_tpu.tool.gmsh_io.GmshIO")


def make_decomposition(box, fractures):
    """Gated (reference frac_geom.py): needs geomop's polygon decomposition."""
    _require_geomop()


def make_regions(decomp):
    """Gated (reference frac_geom.py)."""
    _require_geomop()


def add_reg(regions, name, dim, **kwargs):
    """Gated (reference frac_geom.py)."""
    _require_geomop()


def fill_lg(decomp, regions):
    """Gated (reference frac_geom.py)."""
    _require_geomop()


def make_mesh(geometry, mesh_step, mesh_file):
    """Gated (reference frac_geom.py): needs geomop + the gmsh binary."""
    _require_geomop()
