// HierarchyVisualization.tsx: David's-score hierarchy, steepness regression,
// inter-rater agreement, snapshots, full Elo recalculation.
import {api, h, main, fmt, esc, short, toast, sparkline, USER}
  from "/static/app.js";

export default async function HierarchyVisualization() {
  const hr = await api("/api/elo/hierarchy");
  const max = Math.max(...hr.ranking.map(r => r.davids_score), 1e-9);
  const min = Math.min(...hr.ranking.map(r => r.davids_score), 0);
  const privileged = USER && ["admin", "researcher"].includes(USER.role);
  main.append(h(`<div class="panel"><h2>Lameness hierarchy
      <span class="dim">(normalized David's scores)</span></h2>
    <div class="row">
      <span class="dim">steepness</span><b>${fmt(hr.steepness)}</b>
      <span class="dim">± ${fmt(hr.steepness_se)}</span>
      <span class="dim">inter-rater agreement</span>
      <b>${fmt(hr.inter_rater_reliability)}</b>
      <span class="dim">${hr.total_comparisons} comparisons</span>
      ${privileged ? `<button class="ghost" id="snap">Save snapshot</button>` : ""}
      ${USER && USER.role === "admin"
        ? `<button class="ghost" id="recalc">Recalculate from scratch</button>` : ""}
    </div>
    <div class="dim" style="margin-bottom:8px">Steepness is the slope of
      David's score vs rank: steep = a clear lameness order, flat = raters
      disagree or cows are similar.</div>
    <table id="ranking"></table></div>
    <div class="panel"><h2>David's score distribution</h2><div id="dist"></div>
    </div>`));

  document.getElementById("ranking").innerHTML =
    "<tr><th>#</th><th>video</th><th style='width:45%'></th><th>DS</th><th></th></tr>" +
    hr.ranking.map(r => `<tr><td>#${r.rank}</td>
      <td class="dim">${short(r.video_id, 12)}</td>
      <td><div class="bar"><i style="width:${
        100 * (r.davids_score - min) / Math.max(max - min, 1e-9)}%"></i></div></td>
      <td>${fmt(r.davids_score)}</td>
      <td><button class="mini" onclick="go('analysis','${r.video_id}')">
        analysis</button></td></tr>`).join("") ||
    "<tr><td class='dim'>no comparisons yet — rate pairs first</td></tr>";

  document.getElementById("dist").innerHTML =
    sparkline(hr.ranking.map(r => r.davids_score), {w: 560, h: 90});

  // snapshot history (GET /api/elo/snapshots)
  const snaps = await api("/api/elo/snapshots");
  if (snaps.length) {
    main.append(h(`<div class="panel"><h2>Snapshots (${snaps.length})</h2>
      <table><tr><th>name</th><th>when</th><th>comparisons</th>
        <th>steepness</th><th>IRR</th></tr>
      ${snaps.map(s => `<tr><td>${esc(s.name || s.id)}</td>
        <td class="dim">${esc((s.created_at || "").slice(0, 16))}</td>
        <td>${s.total_comparisons}</td><td>${fmt(s.steepness)}</td>
        <td>${fmt(s.inter_rater_reliability)}</td></tr>`).join("")}
      </table></div>`));
  }

  const snap = document.getElementById("snap");
  if (snap) snap.onclick = async () => {
    try {
      const r = await api("/api/elo/snapshot",
                          {json: {name: `ui-${new Date().toISOString()}`}});
      toast(`snapshot ${r.snapshot_id} saved (steepness ${fmt(r.steepness)})`);
      window.go("hierarchy");
    } catch (e) { toast(e.message, "bad"); }
  };
  const recalc = document.getElementById("recalc");
  if (recalc) recalc.onclick = async () => {
    try {
      const r = await api("/api/elo/recalculate", {method: "POST"});
      toast(`replayed ${r.recalculated} comparisons`);
      window.go("hierarchy");
    } catch (e) { toast(e.message, "bad"); }
  };
}
