"""Generate the 3D DEM e2e deck (tests/golden/dem_bar3d): the 3D analogue
of tests/golden/dem_bar — a 0.6 x 0.1 x 0.1 m bar of 12x2x2 H8 elements
(GiD mesh format, Read-GID-Mesh.c), both end faces pinned, all nodes
transversely pinned (V.y = V.z = 0 -> axial vibration), uniform initial
axial velocity 1 m/s, Neo-Hookean E=1e7 nu=0, Discrete-Energy-Momentum
scheme, 20 steps at CFL 0.4.

H8 connectivity follows N__H8__ (src/Nodes/H8.c:97): nodes 0-3 on the
zeta=-1 face counterclockwise in (xi, eta), nodes 4-7 on zeta=+1.

Run:  python scripts/make_dem_bar3d_deck.py
then  python scripts/make_reference_e2e_golden.py   (3D binary leg)
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DECK = os.path.join(REPO, "tests", "golden", "dem_bar3d")

NX, NY, NZ = 12, 2, 2
H = 0.05


def node_id(i, j, k):
    # z fastest, then y, then x (mirrors the 2D deck's y-fastest layout)
    return (i * (NY + 1) + j) * (NZ + 1) + k


def main():
    os.makedirs(DECK, exist_ok=True)
    lines = [f"MESH dimension 3 ElemType Hexahedra Nnode 8", "Coordinates"]
    nid = 0
    for i in range(NX + 1):
        for j in range(NY + 1):
            for k in range(NZ + 1):
                nid += 1
                lines.append(
                    f"{nid} {i * H:.6f} {j * H:.6f} {k * H:.6f}"
                )
    lines.append("End Coordinates")
    lines.append("Elements")
    eid = 0
    for i in range(NX):
        for j in range(NY):
            for k in range(NZ):
                eid += 1
                n = [
                    node_id(i, j, k), node_id(i + 1, j, k),
                    node_id(i + 1, j + 1, k), node_id(i, j + 1, k),
                    node_id(i, j, k + 1), node_id(i + 1, j, k + 1),
                    node_id(i + 1, j + 1, k + 1), node_id(i, j + 1, k + 1),
                ]
                lines.append(f"{eid} " + " ".join(str(v + 1) for v in n))
    lines.append("End Elements")
    mesh = "\n".join(lines) + "\n"
    for name in ("bg.msh", "body.msh"):
        open(os.path.join(DECK, name), "w").write(mesh)

    n_nodes = (NX + 1) * (NY + 1) * (NZ + 1)
    left = [node_id(0, j, k) for j in range(NY + 1) for k in range(NZ + 1)]
    right = [node_id(NX, j, k) for j in range(NY + 1) for k in range(NZ + 1)]
    open(os.path.join(DECK, "left.txt"), "w").write(
        "\n".join(str(v) for v in sorted(left)) + "\n"
    )
    open(os.path.join(DECK, "right.txt"), "w").write(
        "\n".join(str(v) for v in sorted(right)) + "\n"
    )
    open(os.path.join(DECK, "all.txt"), "w").write(
        "\n".join(str(v) for v in range(n_nodes)) + "\n"
    )
    # GramsInitials lists ELEMENT ids (Read_GramsInitials.c semantics)
    open(os.path.join(DECK, "allp.txt"), "w").write(
        "\n".join(str(v) for v in range(NX * NY * NZ)) + "\n"
    )
    open(os.path.join(DECK, "zero.txt"), "w").write(
        "DAT_CURVE NUM#20\nCONSTANT_CURVE SCALE#0.0\n"
    )
    open(os.path.join(DECK, "sim.nlp"), "w").write(
        """NLPS-Solver (Type=Discrete-Energy-Momentum) {
\tCFL=0.4
\tCel=100.0
\tN=20
\tEpsilon=1.0
\trb-Generalized-alpha=0.0
\tTOL-Generalized-alpha=0.000001
\tTOL-Newmark-beta=0.000001
\tMax-Iter=50
}
GramsBox (Type=GID,File=bg.msh) {
\tGramsBoundary (File=left.txt) {
\t\tBcDirichlet V.x zero.txt
\t\tBcDirichlet V.y zero.txt
\t\tBcDirichlet V.z zero.txt
\t}
\tGramsBoundary (File=right.txt) {
\t\tBcDirichlet V.x zero.txt
\t\tBcDirichlet V.y zero.txt
\t\tBcDirichlet V.z zero.txt
\t}
\tGramsBoundary (File=all.txt) {
\t\tBcDirichlet V.x NULL
\t\tBcDirichlet V.y zero.txt
\t\tBcDirichlet V.z zero.txt
\t}
}
GramsShapeFun (Type=FEM) {
}
Define-Material (idx=0,Model=Neo-Hookean-Wriggers) {
\tE=10000000.0
\tnu=0.0
\trho=1000.0
}
One-Phase-Analysis (File=body.msh,GPxElement=8) {
}
GramsInitials (Nodes=allp.txt) {
\tValue=[1.0,0.0,0.0]
}
GramsOutputs (i=1) {
\tDIR=out
\tOut-velocity=true
\tOut-stress=true
}
"""
    )
    print(f"{DECK}: {n_nodes} nodes, {NX*NY*NZ} elements")


if __name__ == "__main__":
    main()
