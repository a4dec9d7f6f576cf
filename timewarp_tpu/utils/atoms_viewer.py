"""Standalone-HTML interactive trajectory viewer.

TPU-native counterpart of the reference's Jupyter-only atoms viewer
(reference: visualise/atoms_viewer/__init__.py + atoms_viewer.js): instead of
an IPython widget, ``write_viewer_html`` embeds the trajectory as JSON inside
a single self-contained HTML file (zero dependencies, works in any browser,
ships with a run's report directory). Renderer: canvas painter's-algorithm
spheres + bond sticks, drag-to-rotate, wheel-to-zoom, frame slider and
play/pause.
"""
import json
from typing import Optional, Sequence

import numpy as np

# CPK-ish colors and display radii (nm) for the 5-element vocabulary.
ELEMENT_STYLE = {
    "C": ("#555b61", 0.070),
    "H": ("#e8e8e8", 0.032),
    "N": ("#3050f8", 0.065),
    "O": ("#e0301e", 0.060),
    "S": ("#d6b600", 0.100),
}

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ margin:0; background:#14171a; color:#dfe3e6; font:13px sans-serif; }}
 #bar {{ padding:8px 12px; display:flex; gap:12px; align-items:center; }}
 canvas {{ display:block; margin:auto; }}
 input[type=range] {{ width:320px; }}
</style></head><body>
<div id="bar">
 <b>{title}</b>
 <button id="play">&#9654;</button>
 <input type="range" id="frame" min="0" max="0" value="0">
 <span id="label"></span>
</div>
<canvas id="cv" width="900" height="640"></canvas>
<script>
const DATA = {data_json};
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const slider = document.getElementById('frame'), label = document.getElementById('label');
const playBtn = document.getElementById('play');
slider.max = DATA.frames.length - 1;
let frame = 0, playing = false, rx = 0.4, ry = 0.6, zoom = 1.0, drag = null;

function center(pts) {{
  let c = [0,0,0];
  for (const p of pts) {{ c[0]+=p[0]; c[1]+=p[1]; c[2]+=p[2]; }}
  return c.map(v => v/pts.length);
}}
function rot(p, c) {{
  let x = p[0]-c[0], y = p[1]-c[1], z = p[2]-c[2];
  let y2 = y*Math.cos(rx) - z*Math.sin(rx), z2 = y*Math.sin(rx) + z*Math.cos(rx);
  let x3 = x*Math.cos(ry) + z2*Math.sin(ry), z3 = -x*Math.sin(ry) + z2*Math.cos(ry);
  return [x3, y2, z3];
}}
function draw() {{
  ctx.fillStyle = '#14171a'; ctx.fillRect(0,0,cv.width,cv.height);
  const pts = DATA.frames[frame], c = center(pts);
  const scale = zoom * Math.min(cv.width, cv.height) / (2.5 * DATA.extent);
  const proj = pts.map(p => {{
    const q = rot(p, c);
    return [cv.width/2 + q[0]*scale, cv.height/2 - q[1]*scale, q[2], scale];
  }});
  ctx.lineWidth = Math.max(1.5, 0.02*scale);
  ctx.strokeStyle = '#7d848b';
  for (const [i,j] of DATA.bonds) {{
    ctx.beginPath(); ctx.moveTo(proj[i][0], proj[i][1]);
    ctx.lineTo(proj[j][0], proj[j][1]); ctx.stroke();
  }}
  const order = proj.map((p,i)=>i).sort((a,b)=>proj[a][2]-proj[b][2]);
  for (const i of order) {{
    const [x,y] = proj[i], st = DATA.style[DATA.elements[i]];
    ctx.beginPath(); ctx.arc(x, y, Math.max(2, st[1]*scale), 0, 6.2832);
    ctx.fillStyle = st[0]; ctx.fill();
    ctx.strokeStyle = '#0c0e10'; ctx.lineWidth = 1; ctx.stroke();
  }}
  label.textContent = `frame ${{frame+1}} / ${{DATA.frames.length}}`;
  slider.value = frame;
}}
slider.oninput = () => {{ frame = +slider.value; draw(); }};
playBtn.onclick = () => {{ playing = !playing; playBtn.innerHTML = playing ? '&#10074;&#10074;' : '&#9654;'; }};
setInterval(() => {{ if (playing) {{ frame = (frame+1) % DATA.frames.length; draw(); }} }}, 80);
cv.onmousedown = e => drag = [e.clientX, e.clientY];
window.onmouseup = () => drag = null;
window.onmousemove = e => {{
  if (!drag) return;
  ry += (e.clientX - drag[0]) * 0.01; rx += (e.clientY - drag[1]) * 0.01;
  drag = [e.clientX, e.clientY]; draw();
}};
cv.onwheel = e => {{ e.preventDefault(); zoom *= e.deltaY < 0 ? 1.1 : 0.9; draw(); }};
draw();
</script></body></html>
"""


def write_viewer_html(
    path: str,
    coords: np.ndarray,
    elements: Sequence[str],
    bonds: Optional[np.ndarray] = None,
    title: str = "trajectory",
    max_frames: int = 400,
) -> str:
    """Write a self-contained interactive viewer.

    Args:
      path: output .html path.
      coords: ``[T, V, 3]`` (or ``[V, 3]``) positions in nm.
      elements: length-V element symbols (C/H/N/O/S).
      bonds: optional ``[E, 2]`` atom-index pairs drawn as sticks.
      max_frames: uniform thinning bound to keep the file small.
    """
    coords = np.asarray(coords, np.float32)
    if coords.ndim == 2:
        coords = coords[None]
    T = coords.shape[0]
    if T > max_frames:
        coords = coords[np.linspace(0, T - 1, max_frames).astype(int)]
    extent = float(
        np.abs(coords - coords.mean(axis=1, keepdims=True)).max() + 1e-6
    )
    data = {
        "frames": [np.round(f, 4).tolist() for f in coords],
        "elements": list(elements),
        "bonds": [] if bonds is None else np.asarray(bonds).tolist(),
        "style": ELEMENT_STYLE,
        "extent": extent,
    }
    html = _PAGE.format(title=title, data_json=json.dumps(data))
    with open(path, "w") as f:
        f.write(html)
    return path
