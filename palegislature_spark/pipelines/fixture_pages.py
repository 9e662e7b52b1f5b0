"""Stored-HTML fixture for the crawl lifecycle: one deterministic
page per stage, exercising every extractor the reference's five-stage
crawl drives (``crawl.py:639-738``).

Lives in the package (not tests/) because the ``crawl_lifecycle_counts``
registry query replays the full five-stage crawl over these pages so
the S1/S2/Q5 sources get a driver-gate oracle row, not just pytest
coverage. Tests and tools import the same constants.

The surrogate-id scheme mirrors ``pipelines/crawl.py``: ids are
deterministic functions of the natural keys (no autoincrement), so the
expected store contents below are replay-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SESSION_URL = "https://x/SessionDays.cfm?Chamber=H"
SESSION_HTML = """
<html><body>
<select id="SessID"><option value="20190" selected>2019-2020 Regular Session</option></select>
<div class="Column-OneHalf">
  <h3>Session Days</h3>
  <div class="CalendarDisplay-List-Row">
    <div class="CalendarDisplay-List-Month">June</div><a>1</a>
  </div>
</div>
</body></html>
"""

# Surrogate ids are deterministic functions of the natural keys (the
# production pattern for a distributed autoincrement-free store).
SESSION_ID = 2019 * 100 + 1 * 10 + 0  # year*100 + chamber*10 + index
DAY_ID = 20190601 * 10 + 1  # date*10 + chamber
ROLL_ID = SESSION_ID * 1000 + 1  # session*1000 + number

DAY_URL = f"https://x/sessionPriorDays.cfm?day_id={DAY_ID}"
DAY_HTML = """
<html><body>
<table class="DataTable"><tbody>
<tr><td><a id="RCLink1"
 href="rc_view_action2.cfm?sess_yr=2019&amp;sess_ind=0&amp;rc_body=H&amp;rc_nbr=1">HB 1 PN 1</a></td></tr>
</tbody></table>
</body></html>
"""

ROLL_URL = f"https://x/rc_view_action2.cfm?session_id={SESSION_ID}&roll_id={ROLL_ID}"
ROLL_HTML = """
<html><body>
<div class="RollCalls-ListContainer">
  <div><span>Y</span> SMITH</div>
  <div><span>N</span> DOE</div>
  <div><span>X</span> WHITE</div>
</div>
<div class="Column-OneFourth">
  <div>Info</div>
  <div><div>06/01/2019</div><div>10:00 AM</div><div>legend</div></div>
</div>
</body></html>
"""

CURRENT_URL = "https://x/mbrList.cfm?body=H&SessYear=2019"
CURRENT_HTML = """
<html><body>
<select id="SessYear"><option value="2019" selected>2019-2020</option></select>
<div class="MemberInfoList-MemberWrapper"><div class="MemberInfoList-MemberBio">
  <a href="bio.cfm?id=501">John Smith</a> (D)<br/> District 18
</div></div>
<div class="MemberInfoList-MemberWrapper"><div class="MemberInfoList-MemberBio">
  <a href="bio.cfm?id=502">Mary Doe</a> (R)<br/> District 44
</div></div>
<div class="MemberInfoList-MemberWrapper"><div class="MemberInfoList-MemberBio">
  <a href="bio.cfm?id=503">Tom White</a> (D)<br/> District 7
</div></div>
</body></html>
"""

BIO_URL = "https://x/bio.cfm?member_id=1&chamber=1"
BIO_HTML = """
<html><body>
<h1>John Smith</h1>
<h4>6/1/1970 - Present</h4>
<div class="bio-table"><table>
<tr><th>Sessions</th><th>Office</th><th>Position</th><th>District</th><th>Party</th></tr>
<tr><td>2017-2018</td><td>Representative</td><td></td><td>18</td><td>Democrat</td></tr>
</table></div>
</body></html>
"""

# URL map for stored_page_source: the per-stage fetch URLs the crawl
# builds (the day/roll URL builders below reproduce them from ids).
PAGES = {
    SESSION_URL: SESSION_HTML,
    f"https://x/day.cfm?day_id={DAY_ID}": DAY_HTML,
    f"https://x/roll.cfm?session_id={SESSION_ID}&roll_id={ROLL_ID}": ROLL_HTML,
    CURRENT_URL: CURRENT_HTML,
    BIO_URL: BIO_HTML,
}


def url_of_day(col):
    return F.concat(F.lit("https://x/day.cfm?day_id="), col.cast("string"))


def url_of_roll(sid, rid):
    return F.concat(
        F.lit("https://x/roll.cfm?session_id="),
        sid.cast("string"),
        F.lit("&roll_id="),
        rid.cast("string"),
    )
