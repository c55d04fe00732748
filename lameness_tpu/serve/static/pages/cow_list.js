// CowList.tsx: Re-ID cow registry with summary stats.
import {api, h, main, esc, short, when, table} from "/static/app.js";

export default async function CowList() {
  const [cows, stats] = await Promise.all([
    api("/api/cows"), api("/api/cows/summary/stats")]);
  main.append(h(`<div class="grid">
    <div class="panel"><div class="dim">cows tracked</div>
      <div class="stat">${stats.total_cows}</div></div>
    <div class="panel"><div class="dim">with lameness records</div>
      <div class="stat">${stats.cows_with_lameness}</div></div>
  </div>
  <div class="panel"><h2>Cow registry</h2><div id="list"></div></div>`));
  document.getElementById("list").innerHTML = cows.length ? table(cows, [
    ["cow", c => `<b>${esc(c.cow_id)}</b>`],
    ["tag", c => esc(c.tag_number || "—")],
    ["breed", c => esc(c.breed || "—")],
    ["sightings", c => c.total_sightings],
    ["first seen", c => `<span class="dim">${when(c.first_seen)}</span>`],
    ["last seen", c => `<span class="dim">${when(c.last_seen)}</span>`],
    ["validated", c => c.is_validated ? "✓" : "—"],
  ], {rowAttr: c => `class="click" onclick="go('cow','${c.cow_id}')"`})
    : `<span class="dim">no cows identified yet — Re-ID creates entries as
       videos are analyzed</span>`;
}
