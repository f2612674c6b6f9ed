"""Build and run the reference's standalone constitutive harnesses to produce
golden strain-path files (tests/golden/*.csv) — the head-to-head correctness
gate of BASELINE.md at the constitutive level.

Why not the full reference binary: /root/reference/nl-partsol/CMakeLists.txt
requires PETSc (U-Newmark-beta.c uses SNES types unconditionally) and LAPACKE
headers; this image ships neither (only liblapack.so.3 runtime).  The
reference's own verification artefacts are its standalone constitutive
harnesses (tests/Constitutive/*.c — self-contained copies of the src/
models driven on fixed strain paths, see SURVEY.md §4), which need only
``dsyev_``.  We compile those in /tmp (patched copies: gnuplot popen removed,
full per-step state dumped to CSV) and commit their outputs as golden data.

Provenance per file:
  vonmises_uniaxial.csv  <- tests/Constitutive/Von-Mises.c      (E=1e3, nu=0.2,
      kappa0=10, perfect plasticity; d_phi=diag(1,0.9999,1), 100 steps)
  druckerprager_uniaxial.csv <- tests/Constitutive/Drucker-Prager-Backward-Euler.c
      (E=1e4, nu=0.2, kappa0=40, phi=39, psi=6, H=0.1, m=1, p0=-20,
       d_phi=diag(1,0.999,1), 50 steps)
  matsuoka_triaxial.csv  <- tests/Constitutive/Matsuoka_Nakai.c  (params from
      the harness's active #define block; confined triaxial strain path)
  modified_lade_duncan_triaxial.csv <- scripts/Borja-Constitutive-Models/
      Frictional-Monolithic.c with Yield_Function "Modified-Lade-Duncan"
      (E=100e3, nu=0.2, pa=-100, m=0.2, c0=27, a=[20000,0.005,35],
       alpha=0.5, phi=20 deg, confining=-200, 2101 steps of d_eps=-1e-5)

Columns: step then the harness state arrays (see DUMPS below).
Run:  python scripts/make_reference_golden.py
"""

import os
import re
import shutil
import subprocess
import sys

REF = "/root/reference/nl-partsol/tests/Constitutive"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "golden")
BUILD = "/tmp/refgold"

LAPACKE_STUB = """#ifndef LAPACKE_STUB_H
#define LAPACKE_STUB_H
/* minimal shim: the harnesses call the Fortran symbol dsyev_ directly */
extern void dsyev_(const char *jobz, const char *uplo, int *n, double *a,
                   int *lda, double *w, double *work, int *lwork, int *info);
extern void dgetrf_(int *m, int *n, double *a, int *lda, int *ipiv, int *info);
extern void dgetrs_(const char *trans, int *n, int *nrhs, double *a, int *lda,
                    int *ipiv, double *b, int *ldb, int *info);
extern double dlange_(const char *norm, int *m, int *n, double *a, int *lda,
                      double *work);
extern void dgecon_(const char *norm, int *n, double *a, int *lda,
                    double *anorm, double *rcond, double *work, int *iwork,
                    int *info);
#endif
"""

PRELUDE = (
    "#include <stdio.h>\n#include <stdlib.h>\n#include <math.h>\n"
    '#include <stdbool.h>\n#include <string.h>\n#include "lapacke.h"\n'
)

# (source file, binary name, golden csv, dump C code)
JOBS = [
    (
        "Von-Mises.c",
        "vm",
        "vonmises_uniaxial.csv",
        """
  FILE *gold = fopen("GOLDEN_OUT", "w");
  fprintf(gold, "step,s_xx,s_xy,s_yx,s_yy,s_zz,Fyy,eps\\n");
  for (int i = 0; i < NumberSteps; i++)
    fprintf(gold, "%d,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e\\n", i,
            stress[i*5+0], stress[i*5+1], stress[i*5+2], stress[i*5+3],
            stress[i*5+4], D_phi[i*5+3], EPS[i]);
  fclose(gold);
""",
    ),
    (
        "Drucker-Prager-Backward-Euler.c",
        "dp",
        "druckerprager_uniaxial.csv",
        """
  FILE *gold = fopen("GOLDEN_OUT", "w");
  fprintf(gold, "step,s_xx,s_xy,s_yx,s_yy,s_zz,Fyy,eps,kappa\\n");
  for (int i = 0; i < NumberSteps; i++)
    fprintf(gold, "%d,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e\\n", i,
            stress[i*5+0], stress[i*5+1], stress[i*5+2], stress[i*5+3],
            stress[i*5+4], D_phi[i*5+3], Equiv_Plast_Str[i], kappa1[i]);
  fclose(gold);
""",
    ),
    (
        "Matsuoka_Nakai.c",
        "mn",
        "matsuoka_triaxial.csv",
        """
  FILE *gold = fopen("GOLDEN_OUT", "w");
  fprintf(gold, "step,s1,s2,s3,e1,e2,e3,eps,kappa\\n");
  for (int i = 0; i < NumberSteps; i++)
    fprintf(gold, "%d,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e,%.17e\\n", i,
            stress[i*3+0], stress[i*3+1], stress[i*3+2],
            strain[i*3+0], strain[i*3+1], strain[i*3+2], EPS[i], kappa1[i]);
  fclose(gold);
""",
    ),
    (
        # the reference's own Borja-family development harness, run in its
        # Modified-Lade-Duncan mode (the in-tree Modified-Lade-Duncan.c is
        # never dispatched; this is the only executable MLD oracle)
        "/root/reference/scripts/Borja-Constitutive-Models/Frictional-Monolithic.c",
        "mld",
        "modified_lade_duncan_triaxial.csv",
        """
  FILE *gold = fopen("GOLDEN_OUT", "w");
  fprintf(gold, "step,s1,s2,s3,eps,kappa\\n");
  for (int i = 0; i < NumberSteps; i++)
    fprintf(gold, "%d,%.17e,%.17e,%.17e,%.17e,%.17e\\n", i,
            stress[i*3+0], stress[i*3+1], stress[i*3+2], Lambda[i], kappa1[i]);
  fclose(gold);
""",
    ),
]

# per-source #define overrides (regex -> replacement), applied pre-patch
DEFINE_OVERRIDES = {
    "Frictional-Monolithic.c": [
        (r'#define Yield_Function "Matsuoka-Nakai"',
         '#define Yield_Function "Modified-Lade-Duncan"'),
        (r"#define m_Parameter 0\.0", "#define m_Parameter 0.2"),
        (r"#define c0_Parameter 9\.0", "#define c0_Parameter 27.0"),
        (r"#define FrictionAngle 0", "#define FrictionAngle 20"),
    ],
}


def patch(src_text: str, dump_code: str, out_csv: str) -> str:
    # cut gnuplot popen section: "// Print data with gnuplot" .. "// Free memory"
    text = re.sub(
        r"// Print data with gnuplot.*?// Free memory",
        "// Free memory",
        src_text,
        flags=re.S,
    )
    # insert the golden dump before the harness's own CSV writers
    anchor = "// Save data in a csv file"
    if anchor not in text:
        anchor = "// Save p-q in a csv file"  # Frictional-Monolithic.c:281
    assert anchor in text, "anchor not found"
    dump = dump_code.replace("GOLDEN_OUT", out_csv)
    text = text.replace(anchor, dump + "\n  " + anchor, 1)
    # silence the per-step narration
    text = text.replace('printf("Step: %i \\n", i);', ";")
    text = text.replace('printf("*********************\\n");', ";")
    return PRELUDE + text


def main():
    os.makedirs(BUILD, exist_ok=True)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(BUILD, "lapacke.h"), "w") as f:
        f.write(LAPACKE_STUB)
    for src, binname, out_csv, dump in JOBS:
        src_path = src if os.path.isabs(src) else os.path.join(REF, src)
        text = open(src_path).read()
        for pat, repl in DEFINE_OVERRIDES.get(os.path.basename(src), []):
            new = re.sub(pat, repl, text)
            assert new != text, f"define override {pat!r} matched nothing"
            text = new
        gold_path = os.path.join(OUT, out_csv)
        patched = patch(text, dump, gold_path)
        c_path = os.path.join(BUILD, os.path.basename(src))
        open(c_path, "w").write(patched)
        bin_path = os.path.join(BUILD, binname)
        cmd = [
            "gcc", "-O2", "-std=c99", f"-I{BUILD}", c_path, "-o", bin_path,
            "-l:liblapack.so.3", "-l:libblas.so.3", "-lm",
        ]
        print("+", " ".join(cmd))
        subprocess.run(cmd, check=True)
        print("+ run", bin_path)
        r = subprocess.run(
            [bin_path], cwd=BUILD, stdout=subprocess.DEVNULL, timeout=600
        )
        if r.returncode != 0:
            print(f"  {binname} exited {r.returncode} (golden truncated at failure step)")
        n = sum(1 for _ in open(gold_path)) - 1
        print(f"  wrote {gold_path} ({n} steps)")


if __name__ == "__main__":
    sys.exit(main())
