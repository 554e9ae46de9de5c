{% macro price_floor(col, threshold=0) -%}
{{ col }} >= {{ threshold }}
{%- endmacro %}
