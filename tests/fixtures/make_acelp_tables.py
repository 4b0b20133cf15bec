"""Generate voice/csrc/etsi_acelp_tables.h from the reference binary.

Reads the ETSI TS 300 395-2 ACELP decoder's data tables (LSP codebooks,
energy quantizer, interpolation filters, log/pow/inv_sqrt tables, ...)
out of the reference sdecoder.exe mapped by the oracle loader, and
emits them as a C header.  The tables are the spec's published
constants; regeneration requires the reference checkout.

Run: PYTHONPATH=/root/repo python tests/fixtures/make_acelp_tables.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "codec"))

from oracle_harness import Oracle  # noqa: E402

OUT = (pathlib.Path(__file__).parents[2] / "tetraear_tpu" / "voice" /
       "csrc" / "etsi_acelp_tables.h")

TABLES = [
    # (symbol, n_words, c_name)
    ("dico1_clsp", 768, "ETSI_DICO1_CLSP"),       # 256 x 3 LSP codebook
    ("dico2_clsp", 1536, "ETSI_DICO2_CLSP"),      # 512 x 3
    ("dico3_clsp", 2048, "ETSI_DICO3_CLSP"),      # 512 x 4
    ("t_qua_ener", 128, "ETSI_T_QUA_ENER"),       # 64 x 2 energy VQ
    ("coef.1", 32, "ETSI_COEF1"),                 # 1/3-resolution interp
    ("coef.2", 32, "ETSI_COEF2"),
    ("coef.3", 8, "ETSI_COEF3"),
    ("coef.4", 8, "ETSI_COEF4"),
    ("tab_inv_sqrt", 49, "ETSI_TAB_INV_SQRT"),
    ("tab_log2", 33, "ETSI_TAB_LOG2"),
    ("tab_pow2", 33, "ETSI_TAB_POW2"),
    ("POW2", 16, "ETSI_POW2"),
    ("SHR.0", 16, "ETSI_SHR0"),
    ("lspold_init", 10, "ETSI_LSPOLD_INIT"),
    ("lsp_old.5", 10, "ETSI_LSP_OLD_INIT"),
    ("old_A", 11, "ETSI_OLD_A_INIT"),
]


def main():
    o = Oracle("sdecoder.exe")
    lines = [
        "/* ETSI EN 300 395-2 ACELP decoder tables.",
        " *",
        " * Extracted from the reference sdecoder binary's data sections",
        " * (see tests/fixtures/make_acelp_tables.py); these are the",
        " * spec's published constants.  Do not edit by hand.",
        " */",
        "",
        "#ifndef ETSI_ACELP_TABLES_H",
        "#define ETSI_ACELP_TABLES_H",
        "",
    ]
    for sym, n, cname in TABLES:
        vals = o.read(sym, n)
        lines.append(f"static const short {cname}[{n}] = {{")
        row = "   "
        for v in vals:
            item = f" {int(v)},"
            if len(row) + len(item) > 78:
                lines.append(row)
                row = "   "
            row += item
        lines.append(row.rstrip(","))
        lines.append("};")
        lines.append("")
    lines.append("#endif /* ETSI_ACELP_TABLES_H */")
    OUT.write_text("\n".join(lines) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
