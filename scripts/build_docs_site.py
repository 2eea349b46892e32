"""Build the static docs site: markdown guides + executed notebooks → HTML.

The reference publishes a sphinx/nbsphinx site to GitHub Pages
(`/root/reference/.github/workflows/static.yml`); this is the counterpart
deliverable built from this repo's markdown doc set (README + docs/*.md +
generated API.md) and the executed notebook gallery
(docs/notebooks/*.ipynb).  Dependency-light by design — stdlib +
`markdown` + `nbconvert`, all present in CI and in this image — so the
build is testable everywhere (`python scripts/build_docs_site.py`,
output in `site/`).  The CI `docs` job uploads the result as an artifact
and deploys it to Pages on main.
"""

from __future__ import annotations

import os
import re
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "site")

CSS = """
:root { --fg:#1a1d23; --bg:#ffffff; --accent:#0b5fa5; --muted:#5a6270;
        --code-bg:#f5f6f8; --border:#e3e6ea; }
* { box-sizing: border-box; }
body { margin:0; font:16px/1.6 system-ui,-apple-system,"Segoe UI",sans-serif;
       color:var(--fg); background:var(--bg); display:flex; }
nav { width:280px; min-height:100vh; border-right:1px solid var(--border);
      padding:24px 20px; flex-shrink:0; position:sticky; top:0;
      align-self:flex-start; max-height:100vh; overflow-y:auto; }
nav h1 { font-size:18px; margin:0 0 16px; }
nav h2 { font-size:12px; text-transform:uppercase; letter-spacing:.08em;
         color:var(--muted); margin:18px 0 6px; }
nav a { display:block; color:var(--fg); text-decoration:none;
        padding:3px 8px; border-radius:6px; font-size:14px; }
nav a:hover { background:var(--code-bg); }
nav a.active { background:var(--accent); color:#fff; }
main { flex:1; min-width:0; padding:32px 48px; max-width:980px; }
main h1,main h2,main h3 { line-height:1.25; }
main a { color:var(--accent); }
pre { background:var(--code-bg); padding:12px 16px; border-radius:8px;
      overflow-x:auto; font-size:13.5px; }
code { background:var(--code-bg); padding:1px 5px; border-radius:4px;
       font-size:.92em; }
pre code { background:none; padding:0; }
table { border-collapse:collapse; display:block; overflow-x:auto; }
th,td { border:1px solid var(--border); padding:6px 10px; font-size:14px;
        text-align:left; }
th { background:var(--code-bg); }
img { max-width:100%; }
.nb-frame { border:0; width:100%; height:calc(100vh - 64px); }
"""

PAGE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — pytdscf_tpu</title>
<link rel="stylesheet" href="{root}style.css"></head>
<body>
<nav>
<h1><a href="{root}index.html" style="padding:0">pytdscf_tpu</a></h1>
{nav}
</nav>
<main>
{body}
</main>
</body></html>
"""


def md_to_html(text: str) -> str:
    import markdown

    return markdown.markdown(
        text,
        extensions=["tables", "fenced_code", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )


def rewrite_links(html: str, mapping: dict[str, str]) -> str:
    for src, dst in mapping.items():
        html = html.replace(f'href="{src}"', f'href="{dst}"')
    return html


def build() -> int:
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    with open(os.path.join(OUT, "style.css"), "w") as fh:
        fh.write(CSS)

    guides = [
        ("index", os.path.join(REPO, "README.md"), "Overview"),
        ("quickstart", os.path.join(REPO, "docs", "QUICKSTART.md"),
         "Quickstart"),
        ("workflows", os.path.join(REPO, "docs", "WORKFLOWS.md"),
         "Workflows"),
        ("parallel", os.path.join(REPO, "docs", "PARALLEL.md"),
         "Parallelism"),
        ("radical_pair", os.path.join(REPO, "docs", "RADICAL_PAIR.md"),
         "Radical pair"),
        ("api", os.path.join(REPO, "docs", "API.md"), "API reference"),
        ("notebooks", os.path.join(REPO, "docs", "notebooks", "README.md"),
         "Notebook gallery"),
    ]
    nb_dir = os.path.join(REPO, "docs", "notebooks")
    notebooks = sorted(
        f for f in os.listdir(nb_dir) if f.endswith(".ipynb")
    )

    # md cross-link rewrites (repo-relative → site-relative)
    mapping = {}
    for slug, path, _ in guides:
        rel = os.path.relpath(path, REPO)
        mapping[rel] = f"{slug}.html"
        mapping["./" + os.path.basename(path)] = f"{slug}.html"
        mapping[os.path.basename(path)] = f"{slug}.html"
    for nb in notebooks:
        mapping[nb] = f"nb/{nb[:-6]}.html"
        mapping[f"docs/notebooks/{nb}"] = f"nb/{nb[:-6]}.html"

    def nav_html(active: str, root: str = "") -> str:
        items = ["<h2>Guides</h2>"]
        for slug, _, title in guides:
            cls = ' class="active"' if slug == active else ""
            items.append(
                f'<a href="{root}{slug}.html"{cls}>{title}</a>'
            )
        items.append("<h2>Notebooks</h2>")
        for nb in notebooks:
            name = nb[:-6]
            cls = ' class="active"' if name == active else ""
            items.append(
                f'<a href="{root}nb/{name}.html"{cls}>'
                f"{name.replace('_', ' ')}</a>"
            )
        return "\n".join(items)

    n_pages = 0
    for slug, path, title in guides:
        if not os.path.exists(path):
            print(f"docs_site: SKIP missing {path}", file=sys.stderr)
            continue
        with open(path) as fh:
            body = md_to_html(fh.read())
        body = rewrite_links(body, mapping)
        with open(os.path.join(OUT, f"{slug}.html"), "w") as fh:
            fh.write(PAGE.format(
                title=title, nav=nav_html(slug), body=body, root="",
            ))
        n_pages += 1

    os.makedirs(os.path.join(OUT, "nb"))
    from nbconvert import HTMLExporter

    exporter = HTMLExporter()
    exporter.exclude_input_prompt = True
    exporter.exclude_output_prompt = True
    for nb in notebooks:
        nb_body, _ = exporter.from_filename(os.path.join(nb_dir, nb))
        name = nb[:-6]
        # wrap the exported notebook in the site chrome via an iframe-free
        # embed: nbconvert emits a full document — serve it raw with a
        # thin wrapper page beside it
        with open(os.path.join(OUT, "nb", f"{name}.raw.html"), "w") as fh:
            fh.write(nb_body)
        with open(os.path.join(OUT, "nb", f"{name}.html"), "w") as fh:
            fh.write(PAGE.format(
                title=name, nav=nav_html(name, root="../"),
                body=(
                    f"<h1>{name.replace('_', ' ')}</h1>"
                    f'<iframe class="nb-frame" src="{name}.raw.html"'
                    f' title="{name}"></iframe>'
                ),
                root="../",
            ))
        n_pages += 1

    print(f"docs_site: built {n_pages} pages -> {OUT}")
    # sanity: landing page links resolve
    with open(os.path.join(OUT, "index.html")) as fh:
        index = fh.read()
    broken = [
        m for m in re.findall(r'href="([^"#]+\.html)"', index)
        if not os.path.exists(os.path.join(OUT, m))
    ]
    if broken:
        print(f"docs_site: broken internal links: {broken}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(build())
